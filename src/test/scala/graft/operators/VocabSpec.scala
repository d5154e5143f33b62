package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VocabSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a a b"),
    (2L, "a c"),
    (3L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")

  test("termFrequencies counts occurrences corpus-wide, null-safe") {
    val got = Vocab.termFrequencies(docs).orderBy("term").as[(String, Long)].collect()
    assert(got.toSeq == Seq(("a", 3L), ("b", 1L), ("c", 1L)))
  }

  test("coverage ranks by (n desc, term) with exact cumulative share") {
    val got = Vocab.coverage(docs, k = 2)
      .as[(Int, String, Long, Long, Double)].collect()
    // totals: 5 tokens; a=3 (0.6), then b by the term tie-break (b < c)
    assert(got.toSeq == Seq(
      (1, "a", 3L, 3L, 0.6),
      (2, "b", 1L, 4L, 0.8)))
  }

  test("coverage k past the vocabulary returns the whole curve, ending at 1.0") {
    val got = Vocab.coverage(docs, k = 100).orderBy("rank")
      .select("cum_frac").as[Double].collect()
    assert(got.length == 3 && got.last == 1.0)
  }

  test("the corpus tokenizes ONCE: no tokenize node in the consuming plan") {
    // Same trap as Tfidf: freq feeds both the total subquery and the top-k;
    // without the materialization each consumer would re-run the
    // tokenize→explode→aggregate subtree over the corpus.
    val out = Vocab.coverage(docs, k = 2)
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    assert("(?i)generate explode".r.findAllIn(p).isEmpty,
      s"a consumer re-tokenizes the corpus:\n$p")
    assert(p.contains("ExistingRDD"), s"expected the checkpointed freq scan:\n$p")
  }

  test("top-k is a partial top-k, not a global sort") {
    // TakeOrderedAndProject computes per-partition top-k then merges k rows —
    // the vocabulary never rides a global sort exchange.
    val p = Vocab.coverage(docs, k = 2).queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"expected partial top-k:\n$p")
  }

  test("guards: bad k, missing column") {
    intercept[IllegalArgumentException] { Vocab.coverage(docs, 0) }
    intercept[IllegalArgumentException] {
      Vocab.termFrequencies(Seq((1L, "x")).toDF("doc_id", "body"))
    }
  }
}
