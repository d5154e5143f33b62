package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TfidfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry cherry cherry durian")
  ).toDF("doc_id", "text")

  test("tf, df and tfidf match a hand computation") {
    val out = Tfidf.tfidf(docs).orderBy("doc_id", "term").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5)))
    def idf(df: Long) = math.log((3 + 1.0) / (df + 1.0)) + 1.0
    def w(tf: Double, df: Long) = math.rint(tf * idf(df) * 10000) / 10000
    val expected = Seq(
      (1L, "apple",  2L, 0.6667, 1L, w(2.0 / 3, 1)),
      (1L, "banana", 1L, 0.3333, 2L, w(1.0 / 3, 2)),
      (2L, "banana", 1L, 0.5,    2L, w(0.5, 2)),
      (2L, "cherry", 1L, 0.5,    2L, w(0.5, 2)),
      (3L, "cherry", 3L, 0.75,   2L, w(0.75, 2)),
      (3L, "durian", 1L, 0.25,   1L, w(0.25, 1)))
    assert(out.toSeq == expected)
  }

  test("bm25 matches a hand computation; guards fire") {
    // corpus: doc1 "apple banana apple" (dl=3), doc2 "banana cherry" (dl=2),
    // doc3 "cherry cherry cherry durian" (dl=4); N=3, avgdl=3
    val out = Tfidf.bm25(docs, Seq("apple", "cherry"), k1 = 1.2, b = 0.75)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    def idf(df: Int) = math.log(1.0 + (3 - df + 0.5) / (df + 0.5))
    def w(tf: Int, df: Int, dl: Int) = {
      val raw = idf(df) * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / 3.0))
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = Map(
      1L -> (w(2, 1, 3), 1L),             // apple ×2, df(apple)=1
      2L -> (w(1, 2, 2), 1L),             // cherry ×1, df(cherry)=2
      3L -> (w(3, 2, 4), 1L))             // cherry ×3
    assert(out.length == 3)
    out.foreach { case (id, score, nTerms) =>
      val (es, en) = expected(id)
      assert(math.abs(score - es) < 1e-9 && nTerms == en, s"doc $id: got $score/$nTerms want $es/$en")
    }
    // ordering is score desc, id
    assert(out.map(_._1).toSeq == out.sortBy(r => (-r._2, r._1)).map(_._1).toSeq)
    intercept[IllegalArgumentException] { Tfidf.bm25(docs, Nil) }
    intercept[IllegalArgumentException] { Tfidf.bm25(docs, Seq("a"), b = 1.5) }
  }

  test("bm25Indexed equals direct bm25; buckets prune and the index never shuffles on term") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
    val helper = new AdaptiveSparkPlanHelper {}
    dropTables("tf_postings", "tf_postings_stats")
    val corpus = (0L until 60L).map(i =>
      (i, s"term${i % 7} filler common words term${i % 5} more filler term${i % 7}"))
      .toDF("doc_id", "text")
    Tfidf.writePostingsIndex(corpus, "tf_postings", 4)
    val direct = Tfidf.bm25(corpus, Seq("term0", "term3"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    val indexed = Tfidf.bm25Indexed(spark, "tf_postings", Seq("term0", "term3"))
    val got = indexed.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(got == direct && got.nonEmpty, s"indexed=$got direct=$direct")
    // the index leg consumes the stored term partitioning: no term-keyed
    // exchange may contain the postings scan (only the final per-doc
    // aggregate shuffles, on id)
    val offenders = helper.collectWithSubqueries(indexed.queryExecution.executedPlan) {
      case s: ShuffleExchangeLike if s.outputPartitioning.toString.contains("term#") &&
        s.toString.contains("tf_postings") => s
    }
    assert(offenders.isEmpty, s"postings re-shuffled on term:\n${offenders.mkString("\n")}")
    // bucket pruning: the term filter selects a strict subset of buckets
    val scanLine = indexed.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("SelectedBucketsCount")).getOrElse("")
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(scanLine)
    assert(m.exists(g => g.group(1).toInt < g.group(2).toInt),
      s"term filter must prune buckets: $scanLine")
    dropTables("tf_postings", "tf_postings_stats")
  }

  test("native termCounts matches the explode/groupBy formulation") {
    val tricky = Seq(
      (1L, "a b a  c d a"),           // NBSP is not \s — "c d" is ONE token
      (2L, " edge   spaced  "),
      (3L, "répé répé 日本語"),
      (4L, ""), (5L, "   ")
    ).toDF("doc_id", "text")
    val native = tricky.select(col("doc_id"),
        graft.plans.TextExpressions.termCounts(col("text")).as("tc"))
      .select(col("doc_id"), col("tc.ntok").as("ntok"), explode(col("tc.entries")).as("e"))
      .select(col("doc_id"), col("e.term"), col("e.n"), col("ntok"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3))).toSet
    val columnar = tricky.select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("t"))
      .select(col("doc_id"), size(col("t")).as("ntok"), explode(col("t")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("doc_id", "term", "ntok").agg(count(lit(1)).cast("int").as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(3), r.getInt(2))).toSet
    assert(native == columnar, s"only-native=${native -- columnar} only-columnar=${columnar -- native}")
  }

  test("topTerms ranks by tfidf desc with lexicographic tie-break") {
    val top = Tfidf.topTerms(docs, k = 1).orderBy("doc_id")
      .select("doc_id", "term", "rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    // doc 1: apple dominates; doc 2: banana/cherry tie exactly -> 'banana';
    // doc 3: cherry (0.75 * idf(2)) beats durian (0.25 * idf(1))
    assert(top.toSeq == Seq((1L, "apple", 1), (2L, "banana", 1), (3L, "cherry", 1)))
  }

  test("NULL and empty texts contribute no rows; guards fire") {
    val df = Seq((1L, Some("a b")), (2L, None: Option[String]), (3L, Some(""))).toDF("doc_id", "text")
    val ids = Tfidf.tfidf(df).select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L))
    intercept[IllegalArgumentException] { Tfidf.tfidf(df.withColumn("term", lit(1))) }
    intercept[IllegalArgumentException] { Tfidf.topTerms(df, 0) }
  }

  test("the corpus tokenizes ONCE: no tokenize node in the consuming plan") {
    // Two consumers (the df aggregate and the join leg) read the tf
    // relation; without the materialization Catalyst duplicates the
    // tokenize→explode→shuffle subtree per consumer and exchange reuse
    // cannot collapse it (column pruning diverges between the copies —
    // verified on the AQE final plan). The pin: the consuming plan contains
    // ZERO Generate/explode nodes (the single tokenize lives inside the
    // checkpointed subtree, executed exactly once), and both legs read the
    // materialized RDD.
    val out = Tfidf.tfidf(docs)
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    assert("(?i)generate explode".r.findAllIn(p).isEmpty,
      s"a consumer re-tokenizes the corpus:\n$p")
    assert(p.contains("ExistingRDD"), s"expected the checkpointed tf scan:\n$p")
  }

  test("N counts only non-null texts (the idf subquery matches df semantics)") {
    // 2 real docs, 1 null: a term in both real docs must get df=2, N=2 ->
    // idf = ln(3/3)+1 = 1.0 exactly
    val df = Seq((1L, Some("x")), (2L, Some("x")), (3L, None: Option[String])).toDF("doc_id", "text")
    val row = Tfidf.tfidf(df).filter($"term" === "x").select("tfidf").head()
    assert(row.getDouble(0) == 1.0)
  }
}
