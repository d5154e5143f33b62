package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

class BucketingSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    // Materialize so AQE finalizes the plan, then count real shuffle nodes.
    df.collect()
    val executed = df.queryExecution.executedPlan
    collectWithSubqueries(executed) { case s: ShuffleExchangeLike => s }.size
  }

  test("bucketed x bucketed equi-join runs with ZERO shuffles") {
    val a = (0L until 200L).map(i => (i, s"left $i")).toDF("k", "va")
    val b = (0L until 200L).map(i => (i, s"right $i")).toDF("k", "vb")
    dropTables("bk_a", "bk_b")
    Bucketing.writeBucketed(a, "bk_a", 4, Seq("k"), Seq("k"))
    Bucketing.writeBucketed(b, "bk_b", 4, Seq("k"), Seq("k"))
    val joined = Bucketing.table(spark, "bk_a")
      .join(Bucketing.table(spark, "bk_b"), "k")
      // keep it out of broadcast range so the exchange question is real
      .hint("merge")
    assert(joined.count() == 200)
    assert(shuffles(joined) == 0, joined.queryExecution.executedPlan.toString)
    dropTables("bk_a", "bk_b")
  }

  test("registerBucketed escapes quotes in the location DDL; backslash escape at the unit level (r21)") {
    // end-to-end with a single quote (backslash paths die upstream of any
    // DDL — Hadoop's glob expander rejects them in spark.read.parquet, so
    // the escape's backslash half is pinned at the unit level below)
    val base = java.nio.file.Files.createTempDirectory("graft_bk_esc").toString
    val loc = s"$base/we'ird dir"
    dropTables("bk_esc")
    val df = (0L until 50L).map(i => (i, s"v$i")).toDF("k", "v")
    Bucketing.writeBucketedAt(df, "bk_esc", loc, 2, Seq("k"), Seq("k"))
    spark.sql("DROP TABLE `bk_esc`") // external: files survive the drop
    Bucketing.registerBucketed(spark, "bk_esc", loc, 2, Seq("k"), Seq("k"))
    assert(Bucketing.table(spark, "bk_esc").count() == 50)
    dropTables("bk_esc")
    // backslashes double FIRST, then quotes — a trailing \ must not be able
    // to eat the closing quote, and \' must not collapse into a lone quote
    assert(Bucketing.escapeDdlString("""a\tb""") == """a\\tb""")
    assert(Bucketing.escapeDdlString("""end\""") == """end\\""")
    assert(Bucketing.escapeDdlString("""q'\'""") == """q\'\\\'""")
  }

  test("bucketed group-by on the bucket key skips its exchange") {
    val a = (0L until 200L).map(i => (i % 10, i)).toDF("k", "v")
    dropTables("bk_g")
    Bucketing.writeBucketed(a, "bk_g", 4, Seq("k"))
    val agg = Bucketing.table(spark, "bk_g").groupBy("k").agg(sum("v").as("s"))
    assert(agg.count() == 10)
    assert(shuffles(agg) == 0, agg.queryExecution.executedPlan.toString)
    dropTables("bk_g")
  }

  test("band index probe: corpus side reads co-located, only the new batch shuffles") {
    val corpus = (0L until 100L).map(i => (i, s"corpus doc $i word soup ${i % 7}"))
      .toDF("doc_id", "text")
    dropTables("bk_bands")
    Bucketing.writeBandIndex(Dedup.minhashed(corpus), "bk_bands", 4)

    val batch = (1000L until 1020L).map(i =>
      (i, s"corpus doc ${i - 1000} word soup ${(i - 1000) % 7}")).toDF("doc_id", "text")
    val probe = Dedup.minhashed(batch)
      .select(col("doc_id").as("new_id"), posexplode(col("band_hashes")).as(Seq("band", "bhash")))
    val candidates = Bucketing.table(spark, "bk_bands")
      .join(probe.hint("merge"), Seq("band", "bhash"))
      .select("new_id", "id").distinct()
    assert(candidates.count() >= 20) // every planted exact dup collides in all bands
    // ONE shuffle for the probe side (+ one for distinct); the stored corpus
    // bands contribute none.
    val n = shuffles(candidates)
    assert(n <= 2, s"expected <=2 shuffles (probe + distinct), got $n:\n" +
      candidates.queryExecution.executedPlan.toString)

    // The PRODUCTION path's per-row bands validation must not cost the
    // co-location: as a projection aliasing a derived 'band' it would drop
    // the scan's HashPartitioning and re-shuffle the index side (verified
    // regression); as a filter it preserves partitioning — same shuffle
    // count as the raw join above.
    val validated = Dedup.validatedBandIndex(Bucketing.table(spark, "bk_bands"), 8)
      .join(probe.hint("merge"), Seq("band", "bhash"))
      .select("new_id", "id").distinct()
    assert(shuffles(validated) == n,
      s"bands validation changed the shuffle count:\n" +
        validated.queryExecution.executedPlan.toString)
    dropTables("bk_bands")
  }

  test("guards: missing key and bad bucket count") {
    val df = Seq((1L, "x")).toDF("k", "v")
    intercept[IllegalArgumentException] { Bucketing.writeBucketed(df, "t", 0, Seq("k")) }
    intercept[IllegalArgumentException] { Bucketing.writeBucketed(df, "t", 4, Seq("nope")) }
  }

  test("daily-ingest loop: probe, dedup, append survivors; next day's probe sees them") {
    val day0 = (0L until 60L).map(i => (i, s"seed doc $i totally unique words ${i * 31}"))
      .toDF("doc_id", "text")
    dropTables("bk_loop")
    Bucketing.writeBandIndex(Dedup.minhashed(day0), "bk_loop", 4)

    // Day 1: one dup of the seed corpus, one fresh doc.
    val day1 = Seq(
      (100L, "seed doc 7 totally unique words " + (7 * 31)),
      (101L, "completely new material today")).toDF("doc_id", "text")
    val kept1 = Dedup.minhashIncrementalIndexed(day1, Bucketing.table(spark, "bk_loop"))
    assert(kept1.select("doc_id").as[Long].collect().toSet == Set(101L))
    Bucketing.appendBandIndex(Dedup.minhashed(kept1), "bk_loop", 4)

    // Day 2: a dup of DAY 1's survivor must now be caught via the index.
    val day2 = Seq(
      (200L, "completely new material today"),
      (201L, "another brand new document")).toDF("doc_id", "text")
    val kept2 = Dedup.minhashIncrementalIndexed(day2, Bucketing.table(spark, "bk_loop"))
    assert(kept2.select("doc_id").as[Long].collect().toSet == Set(201L))

    // Mismatched bucket count on append fails loudly, never mis-buckets.
    intercept[Exception] {
      Bucketing.appendBandIndex(Dedup.minhashed(kept2), "bk_loop", 8)
    }
    dropTables("bk_loop")
  }
}
