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
  * Scale shape: ONE tokenize → explode → ONE shuffle on (doc, term) for
  * term counts, materialized once (the two consumers would otherwise each
  * re-tokenize the corpus — see the checkpoint note below) → ONE shuffle
  * on term for document frequencies → join back on term. The df relation
  * is vocabulary-sized (≪ corpus; AQE broadcasts it when small); document
  * bodies never move — only (doc, term, count) triples shuffle. N (corpus
  * size) rides a scalar subquery, not a driver round-trip.
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

    // per-doc token total rides each exploded row (grouped away as first()),
    // so no second window/shuffle partitioned by doc is ever needed
    val terms = docs
      .select(col(idCol), graft.functions.TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), size(col("__toks")).as("__graft_ntok"),
        explode(col("__toks")).as("term"))
      .filter(col("term") =!= "")
    // Materialize the (doc, term) aggregate ONCE (lazy local checkpoint).
    // Both the vocabulary aggregate below and the final join consume `tf`,
    // and in a pure plan Catalyst DUPLICATES the subtree for each consumer;
    // physical exchange reuse then cannot rescue it because column pruning
    // diverges between the copies (the df leg drops the count/first
    // aggregate functions, so the exchange subtrees no longer canonicalize
    // equal — verified against the AQE final plan: without this the corpus
    // tokenizes TWICE, silently). The checkpoint stores only the slim
    // (id, term, n, ntok) triples; the alternative is a second full corpus
    // scan + regexp split, which dominates at scale. Plan-pinned in
    // TfidfSpec: no tokenize node may appear in the consuming plan.
    val tf = terms.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("n"), first(col("__graft_ntok")).as("__graft_ntok"))
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
