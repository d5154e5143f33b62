package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import graft.streaming.EventStreams
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The documented daily-ingest loop, composed END-TO-END over three simulated
  * days — every piece exists and is tested alone (StreamingSpec, DedupSpec,
  * BucketingSpec); this spec pins the COMPOSED contract:
  *
  *   stream (`dedupedStream`, content-hash key)  — collapses same-day
  *     duplicate deliveries, state evicted at the watermark horizon
  *   → `exactIncremental`                         — cross-day exact backstop
  *     (the corpus never shuffles: Bloom sketch by scalar subquery)
  *   → `minhashIncrementalIndexed`                — cross-day near-dup via the
  *     bucketed band index (corpus side reads co-located, zero exchanges)
  *   → `appendBandIndex` + corpus append          — tomorrow probes today
  *
  * Day 3 must drop near-dups of BOTH day-1 and day-2 survivors (the index
  * accumulates), and the index side of the day-3 probe must still contribute
  * zero shuffles after two appends.
  */
class IngestLoopSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def shuffles(df: DataFrame): Int = {
    df.collect()
    collectWithSubqueries(df.queryExecution.executedPlan) {
      case s: ShuffleExchangeLike => s
    }.size
  }

  // ≥12 words each so one-word edits keep shingle-Jaccard well above the 0.7
  // verify threshold; vocabularies disjoint so UNRELATED texts never collide
  private val tA = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
  private val tB = "one two three four five six seven eight nine ten eleven twelve"
  private val tC = "red orange yellow green blue indigo violet crimson amber teal navy plum"
  private val tD = "totally fresh material never before seen in any prior day batch here"

  test("three-day loop: stream dedup → exact incremental → indexed near-dup → band append") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val raw = mem.toDF().toDF("ts", "doc_id", "text")
    // content-hash identity: duplicate DELIVERIES collapse in-stream; the
    // 1-hour horizon means cross-day dups are batch dedup's job, by design
    val q = EventStreams.dedupedStream(
        raw.withColumn("h", sha2(col("text"), 256)), Seq("h"), watermark = "1 hour")
      .select("doc_id", "text")
      .writeStream.format("memory").queryName("ingest_loop_docs")
      .outputMode("append").start()
    try {
      dropTables("bk_ingest")
      var corpus = Seq.empty[(Long, String)].toDF("doc_id", "text")

      def dayBatch(events: Seq[(Timestamp, Long, String)], lo: Long, hi: Long): DataFrame = {
        mem.addData(events: _*)
        q.processAllAvailable()
        spark.table("ingest_loop_docs")
          .filter(col("doc_id") >= lo && col("doc_id") < hi)
      }
      def ids(df: DataFrame): Set[Long] = df.select("doc_id").as[Long].collect().toSet

      // ---- day 1: a retry delivery collapses in-stream; the 23:00 closer
      // advances the watermark past every day-1 key's horizon so day-2
      // re-sends reach the BATCH layers instead of being masked by state
      val batch1 = dayBatch(Seq(
        (ts("2026-01-01 10:00:00"), 101L, tA),
        (ts("2026-01-01 10:01:00"), 101L, tA), // duplicate delivery (retry)
        (ts("2026-01-01 10:02:00"), 102L, tB),
        (ts("2026-01-01 23:00:00"), 199L, "day one closing heartbeat document advancing the watermark horizon now")
      ), 100L, 200L)
      assert(ids(batch1) == Set(101L, 102L, 199L), "stream dedup should collapse the retry")

      val kept1 = Dedup.exactIncremental(batch1, corpus) // empty corpus: all pass
      assert(ids(kept1) == Set(101L, 102L, 199L))
      Bucketing.writeBandIndex(Dedup.minhashed(kept1), "bk_ingest", 4)
      corpus = corpus.unionByName(kept1.select("doc_id", "text"))

      // ---- day 2: an exact cross-day dup, a near-dup of a day-1 survivor,
      // and fresh material — each dropped (or kept) by the right stage
      val batch2 = dayBatch(Seq(
        (ts("2026-01-02 10:00:00"), 201L, tA),           // exact dup of day-1
        (ts("2026-01-02 10:01:00"), 202L, tB + " extra"), // near-dup of day-1
        (ts("2026-01-02 10:02:00"), 203L, tC),           // fresh
        (ts("2026-01-02 23:00:00"), 299L, "day two closing heartbeat document advancing the watermark horizon again")
      ), 200L, 300L)
      assert(ids(batch2) == Set(201L, 202L, 203L, 299L),
        "day-1 stream state must be evicted — cross-day dedup belongs to the batch layers")

      val exact2 = Dedup.exactIncremental(batch2, corpus)
      assert(ids(exact2) == Set(202L, 203L, 299L), "exactIncremental drops the exact re-send only")
      val kept2 = Dedup.minhashIncrementalIndexed(exact2, Bucketing.table(spark, "bk_ingest"))
      assert(ids(kept2) == Set(203L, 299L), "the band index catches the near-dup")
      Bucketing.appendBandIndex(Dedup.minhashed(kept2), "bk_ingest", 4)
      corpus = corpus.unionByName(kept2.select("doc_id", "text"))

      // ---- day 3: near-dups of day-1 AND day-2 survivors — the appended
      // index must expose both generations to the probe
      val batch3 = dayBatch(Seq(
        (ts("2026-01-03 10:00:00"), 301L, tC),            // exact dup of day-2 survivor
        (ts("2026-01-03 10:01:00"), 302L, tA + " extra"), // near-dup of DAY-1 survivor
        (ts("2026-01-03 10:02:00"), 303L, tC.replace("plum", "gold")), // near-dup of DAY-2 survivor
        (ts("2026-01-03 10:03:00"), 304L, tD)             // fresh
      ), 300L, 400L)
      assert(ids(batch3) == Set(301L, 302L, 303L, 304L))

      val exact3 = Dedup.exactIncremental(batch3, corpus)
      assert(ids(exact3) == Set(302L, 303L, 304L))
      val kept3 = Dedup.minhashIncrementalIndexed(exact3, Bucketing.table(spark, "bk_ingest"))
      assert(ids(kept3) == Set(304L),
        "day-3 must drop near-dups of day-1 (302) and day-2 (303) survivors")

      // ---- the scale property after two appends: the index side of the
      // probe join still reads co-located — only the new batch (and the
      // candidate distinct) shuffle; the accumulated corpus contributes none.
      // The batch's own ingest lineage (stream sink → exact dedup, with its
      // internal exchanges) is truncated first so the count measures the
      // probe join, not the upstream pipeline re-derivation.
      val probe = Dedup.minhashed(exact3.localCheckpoint())
        .select(col("doc_id").as("new_id"), posexplode(col("band_hashes")).as(Seq("band", "bhash")))
      val candidates = Dedup.validatedBandIndex(Bucketing.table(spark, "bk_ingest"), 8)
        .join(probe.hint("merge"), Seq("band", "bhash"))
        .select("new_id", "id").distinct()
      val n = shuffles(candidates)
      assert(n <= 2, s"index side of the day-3 probe shuffles (got $n):\n" +
        candidates.queryExecution.executedPlan.toString)

      dropTables("bk_ingest")
    } finally q.stop()
  }
}
