package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DecontamSpec extends SparkSpec {
  import spark.implicits._

  private val bench = Seq(
    (1000L, "the quick brown fox jumps over the lazy dog"),
    (1001L, "pack my box with five dozen liquor jugs")
  ).toDF("doc_id", "text")

  private val docs = Seq(
    (1L, "we saw the quick brown fox jumps again yesterday"), // shares 4-gram "the quick brown fox"
    (2L, "a completely unrelated sentence about spark plans here"),
    (3L, "five dozen liquor jugs were delivered to pack my box with care"), // shares "pack my box with"
    (4L, "quick brown dog fox jumps lazy")                    // shared words, no shared 4-gram
  ).toDF("doc_id", "text")

  test("contaminated = docs sharing any w-gram with the benchmark; rest survive") {
    val bad = Decontam.contaminatedIds(docs, bench, w = 4).as[Long].collect().toSet
    assert(bad == Set(1L, 3L))
    val kept = Decontam.decontaminate(docs, bench, w = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L))
  }

  test("width matters: at w=2 the scrambled doc is contaminated too") {
    // doc 4 shares the bigram "fox jumps" with bench 1000
    val bad = Decontam.contaminatedIds(docs, bench, w = 2).as[Long].collect().toSet
    assert(bad.contains(4L))
  }

  test("a benchmark doc inside the corpus is always contaminated (self-overlap)") {
    val withLeak = docs.unionByName(bench.filter(col("doc_id") === 1000L))
    val kept = Decontam.decontaminate(withLeak, bench, w = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(!kept.contains(1000L))
  }

  test("short docs (< w tokens) match via their whole-text gram only") {
    val shortBench = Seq((1L, "tiny doc")).toDF("doc_id", "text")
    val cand = Seq((10L, "tiny doc"), (11L, "tiny doc extended beyond"), (12L, "tiny"))
      .toDF("doc_id", "text")
    // ShingleSet: len<w → single gram = whole token seq. "tiny doc" matches
    // exactly; "tiny doc extended beyond" (4 tokens, w=4) has gram
    // "tiny doc extended beyond" ≠ "tiny doc"; "tiny" gram ≠ "tiny doc".
    val bad = Decontam.contaminatedIds(cand, shortBench, w = 4).as[Long].collect().toSet
    assert(bad == Set(10L))
  }

  test("invalid width rejected") {
    intercept[IllegalArgumentException](Decontam.contaminatedIds(docs, bench, w = 0))
  }

  test("a contaminated doc with a NULL id is still dropped (null-safe anti-join)") {
    // review regression: a plain === anti-join evaluates NULL = NULL to NULL
    // and would KEEP the benchmark-leaking row
    val withNull = docs.unionByName(
      Seq((Option.empty[Long], "the quick brown fox jumps here too"))
        .toDF("doc_id", "text"))
    val kept = Decontam.decontaminate(withNull, bench, w = 4)
      .select("doc_id").collect()
    assert(!kept.exists(_.isNullAt(0)), "NULL-id contaminated doc must not survive")
    assert(kept.map(_.getLong(0)).toSet == Set(2L, 4L))
  }

  test("__graft_contaminated collision rejected") {
    import spark.implicits._
    val df = Seq((1L, "a b c d")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Decontam.decontaminate(df.withColumn("__graft_contaminated", lit(true)), df)
    }
  }
}
