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
    // Materialize the slim (id, term, n, ntok) triples ONCE (lazy local
    // checkpoint). Both the vocabulary aggregate below and the final join
    // consume `tf`, and in a pure plan Catalyst DUPLICATES the subtree per
    // consumer — the corpus would tokenize-and-count TWICE, silently. The
    // checkpoint stores only the triples; plan-pinned in TfidfSpec: no
    // tokenize node may appear in the consuming plan.
    val tf = postingRows(docs, idCol, textCol).localCheckpoint(eager = false)
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

  /** BM25 ranked retrieval (Robertson/Spärck Jones; the Lucene-smoothed
    * idf): score every document containing at least one of `queryTerms`,
    *
    *   idf(t)     = ln(1 + (N − df + 0.5) / (df + 0.5))
    *   w(d, t)    = idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *   score(d)   = Σ_t w(d, t)
    *
    * returning `(idCol, score, n_terms)` ordered by score desc (doc id
    * ties). Scale shape: term counts come from the scan-side native
    * TermCounts (zero exchanges — see [[tfidf]]), immediately filtered to
    * the query's terms so only matching (doc, term) triples survive; df
    * aggregates over ≤ |queryTerms| keys; N and avgdl ride scalar
    * subqueries. Per-term weights are summed as DECIMAL(18,6) so the
    * cross-engine oracle is exact regardless of FP summation order (the
    * money-sum discipline).
    */
  def bm25(docs: DataFrame, queryTerms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75,
           idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty, "Tfidf.bm25: queryTerms must be non-empty")
    require(queryTerms.forall(_.nonEmpty), "Tfidf.bm25: empty-string query term")
    require(k1 >= 0 && b >= 0 && b <= 1, s"Tfidf.bm25: k1=$k1 must be >= 0 and b=$b in [0,1]")
    Seq(idCol, textCol).foreach(c => require(docs.columns.contains(c),
      s"Tfidf.bm25: input has no '$c' column"))
    Seq("term", "n", "df", "score", "n_terms", "__graft_ntok").foreach(c =>
      require(!docs.columns.contains(c),
        s"Tfidf.bm25: input already has a '$c' column — rename it first"))
    val tf = postingRows(docs, idCol, textCol)
      .filter(col("term").isin(queryTerms: _*))
      .localCheckpoint(eager = false) // two consumers: df aggregate + the join
    // N and avgdl in ONE corpus pass, shipped as ONE struct-typed scalar
    // subquery: two separate subqueries would each rescan the corpus (they
    // don't canonicalize equal, so ReuseSubquery can't merge them), and
    // the ntok needed for avgdl is TermCounts' first field — no second
    // tokenize (same value as size(tokens(text)), spec-pinned).
    import org.apache.spark.sql.graftshim.ColumnShim
    val stats = ColumnShim.scalarSubquery(corpusStats(docs, textCol))
    scorePostings(tf, stats.getField("n_docs"), stats.getField("avgdl"), k1, b, idCol)
  }

  /** `(idCol, term, n (long), __graft_ntok)` posting rows from the
    * scan-side native TermCounts — the shared base of [[tfidf]], [[bm25]]
    * and [[writePostingsIndex]]. Zero exchanges; NULL texts emit no rows.
    */
  private def postingRows(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol),
        graft.plans.TextExpressions.termCounts(col(textCol)).as("__tc"))
      .select(col(idCol), col("__tc.ntok").as("__graft_ntok"),
        explode(col("__tc.entries")).as("__e"))
      .select(col(idCol), col("__e.term").as("term"),
        col("__e.n").cast("long").as("n"), col("__graft_ntok"))

  /** One-row `struct<n_docs, avgdl>` over the live (non-null-text) corpus —
    * one scan, shared by the direct path's scalar subquery and the index
    * write. */
  private def corpusStats(docs: DataFrame, textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .agg(count(lit(1)).as("n_docs"),
        // TokStats, not TermCounts: avgdl needs only the token COUNT, and
        // both natives define ntok identically (= size(tokens(text)),
        // empty-string artifact included — spec-pinned parity), so this
        // full-corpus pass reads two integers off a byte scan instead of
        // building every document's term hash map just to discard it.
        avg(graft.plans.TextExpressions.tokStats(col(textCol)).getField("ntok"))
          .as("avgdl"))
      .select(struct(col("n_docs"), col("avgdl")).as("s"))

  /** The shared BM25 scoring tail over `(idCol, term, n, __graft_ntok)`
    * posting rows — one formula for the direct and indexed paths. */
  private def scorePostings(posts: DataFrame,
                            nDocs: org.apache.spark.sql.Column,
                            avgdl: org.apache.spark.sql.Column,
                            k1: Double, b: Double, idCol: String): DataFrame = {
    val dfreq = posts.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) + (nDocs - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val w = idf * (col("n") * (lit(k1) + lit(1.0))) /
      (col("n") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("__graft_ntok") / avgdl))
    posts.join(dfreq, "term")
      .withColumn("__w", graft.plans.Decimal128.scaled(w, 6))
      .groupBy(col(idCol))
      .agg(graft.plans.Decimal128.sum128(col("__w"), 6).as("score"),
        count(lit(1)).as("n_terms"))
      .orderBy(desc("score"), col(idCol))
  }

  /** Materialize the posting relation `(id, term, n, ntok)` bucketed by
    * `term` — the retrieval sibling of the dedup family's band/fingerprint
    * indexes: with postings pre-shuffled on disk by the probe key, a
    * [[bm25Indexed]] query reads ONLY the query terms' buckets (bucket
    * pruning on the `term` filter) and its df aggregate + posting join
    * consume the stored partitioning with zero exchanges — the only
    * shuffle a query pays is the final per-document score aggregate over
    * slim scored rows. Corpus statistics (N, avgdl — corpus-wide by
    * definition, so they must not be recomputed per query) are written
    * alongside as `<table>_stats`.
    */
  def writePostingsIndex(docs: DataFrame, table: String, buckets: Int,
                         idCol: String = "doc_id", textCol: String = "text"): Unit = {
    Seq(idCol, textCol).foreach(c => require(docs.columns.contains(c),
      s"Tfidf.writePostingsIndex: input has no '$c' column"))
    val posts = postingRows(docs, idCol, textCol)
      .select(col(idCol).as("id"), col("term"), col("n"),
        col("__graft_ntok").as("ntok"))
    Bucketing.writeBucketed(posts, table, buckets, Seq("term"))
    Bucketing.clearTable(docs.sparkSession, table + "_stats")
    corpusStats(docs, textCol).select(col("s.n_docs"), col("s.avgdl"))
      .write.format("parquet").mode(org.apache.spark.sql.SaveMode.Overwrite)
      .saveAsTable(table + "_stats")
  }

  /** BM25 over a stored postings index ([[writePostingsIndex]] layout):
    * identical scores to [[bm25]] on the same corpus (spec-pinned), but
    * the corpus is never re-tokenized and the index side never shuffles —
    * the daily-retrieval shape.
    */
  def bm25Indexed(spark: org.apache.spark.sql.SparkSession, table: String,
                  queryTerms: Seq[String],
                  k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "Tfidf.bm25Indexed: queryTerms must be non-empty")
    require(queryTerms.forall(_.nonEmpty), "Tfidf.bm25Indexed: empty-string query term")
    require(k1 >= 0 && b >= 0 && b <= 1, s"Tfidf.bm25Indexed: k1=$k1 must be >= 0 and b=$b in [0,1]")
    // layout check BEFORE any column is referenced — a malformed index gets
    // the loud 'rebuild it' message, not an AnalysisException from the plan
    val raw = Bucketing.table(spark, table)
    Seq("id", "term", "n", "ntok").foreach(c => require(raw.columns.contains(c),
      s"Tfidf.bm25Indexed: postings index has no '$c' column (expect writePostingsIndex layout)"))
    val posts = raw
      .filter(col("term").isin(queryTerms: _*))
      .withColumnRenamed("ntok", "__graft_ntok")
    import org.apache.spark.sql.graftshim.ColumnShim
    val stats = ColumnShim.scalarSubquery(spark.table(table + "_stats")
      .select(struct(col("n_docs"), col("avgdl")).as("s")))
    scorePostings(posts, stats.getField("n_docs"), stats.getField("avgdl"), k1, b, "id")
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
