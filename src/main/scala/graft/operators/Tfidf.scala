package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TF-IDF term weighting over a document corpus — the classic retrieval /
  * keyword-extraction score, and a shape worth having native because it
  * composes the engine's whole aggregation story: one plan, two linear
  * aggregations and one term join, no driver-side vocabulary.
  *
  *   tf(d, t)  = count of t in d / tokens in d
  *   idf(t)    = ln((N + 1) / (df(t) + 1)) + 1   (smoothed — no zero/∞)
  *   tfidf     = tf × idf
  *
  * Scale shape: term counting is per-document state, so the native
  * [[graft.plans.TextExpressions.termCounts]] expression computes every
  * (doc, term, n) triple INSIDE the scan — no token occurrence ever rides
  * an exchange (the previous explode→groupBy shape shuffled the corpus's
  * every token just to count it against its own document). The slim tf
  * triples are materialized once (two consumers — see the checkpoint note
  * below) → ONE shuffle on term for document frequencies → join back on
  * term. The df relation is vocabulary-sized (≪ corpus; AQE broadcasts it
  * when small); document bodies never move. N (corpus size) rides a
  * scalar subquery, not a driver round-trip.
  *
  * Tokenization is the shared whitespace contract
  * ([[graft.functions.TextFunctions.tokens]]) so the DuckDB oracle
  * recomputes identical terms.
  */
object Tfidf {

  /** Per-(document, term) weights: `(idCol, term, n, tf, df, tfidf)` with
    * `tf`/`tfidf` rounded to 4dp (the engine-parity discipline every scored
    * query here follows). NULL/empty texts contribute no rows.
    */
  def tfidf(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    Seq(idCol, textCol).foreach(c => require(docs.columns.contains(c),
      s"Tfidf: input has no '$c' column"))
    Seq("term", "n", "tf", "df", "tfidf", "__graft_ntok").foreach(c =>
      require(!docs.columns.contains(c),
        s"Tfidf: input already has a '$c' column — rename it first"))
    val spark = docs.sparkSession

    // Materialize the slim (id, term, n, ntok) triples ONCE (lazy local
    // checkpoint). Both the vocabulary aggregate below and the final join
    // consume `tf`, and in a pure plan Catalyst DUPLICATES the subtree per
    // consumer — the corpus would tokenize-and-count TWICE, silently. The
    // checkpoint stores only the triples; plan-pinned in TfidfSpec: no
    // tokenize node may appear in the consuming plan.
    val tf = docs
      .select(col(idCol),
        graft.plans.TextExpressions.termCounts(col(textCol)).as("__tc"))
      .select(col(idCol), col("__tc.ntok").as("__graft_ntok"),
        explode(col("__tc.entries")).as("__e"))
      .select(col(idCol), col("__e.term").as("term"),
        col("__e.n").cast("long").as("n"), col("__graft_ntok"))
      .localCheckpoint(eager = false)
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // N as a scalar subquery — no collect, no recompute per row
    val n = org.apache.spark.sql.graftshim.ColumnShim.scalarSubquery(
      docs.filter(col(textCol).isNotNull).select(count(lit(1)).as("n")))

    tf.join(df, "term")
      .withColumn("tf", round(col("n") / col("__graft_ntok"), 4))
      .withColumn("tfidf",
        round((col("n") / col("__graft_ntok")) *
          (log((n + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0)), 4))
      .select(col(idCol), col("term"), col("n"), col("tf"), col("df"), col("tfidf"))
  }

  /** Top-`k` terms per document by tfidf (ties → lexicographic term order —
    * total, engine-portable ranking).
    */
  def topTerms(docs: DataFrame, k: Int,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k > 0, s"Tfidf.topTerms: k must be positive, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(desc("tfidf"), col("term"))
    tfidf(docs, idCol, textCol)
      .withColumn("__graft_rank", row_number().over(w))
      .filter(col("__graft_rank") <= k)
      .withColumnRenamed("__graft_rank", "rank")
  }
}
