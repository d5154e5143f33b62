package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // quotes: (key, qts, px) — the right side; unique per (key, qts)
  private lazy val quotes = Seq(
    ("A", ts("2024-01-01 10:00:00"), 1.0),
    ("A", ts("2024-01-01 10:00:05"), 2.0),
    ("A", ts("2024-01-01 10:00:10"), 3.0),
    ("B", ts("2024-01-01 10:00:03"), 9.0)
  ).toDF("qkey", "qts", "px")

  // trades: (id, key, tts) — the left side
  private lazy val trades = Seq(
    (1L, "A", ts("2024-01-01 10:00:04")), // after 10:00:00 → px 1.0
    (2L, "A", ts("2024-01-01 10:00:05")), // exactly at a quote → inclusive 2.0 / strict 1.0
    (3L, "A", ts("2024-01-01 09:59:59")), // before every quote → null
    (4L, "B", ts("2024-01-01 10:00:07")), // B's only quote → 9.0
    (5L, "C", ts("2024-01-01 10:00:07")), // key with no quotes → null
    (6L, "A", ts("2024-01-01 10:30:00"))  // long after the last quote → 3.0
  ).toDF("id", "tkey", "tts")

  private def run(strict: Boolean = false, tol: Option[Long] = None): Map[Long, Option[Double]] =
    AsOf.asOfJoin(trades, quotes, "tkey", "qkey", "tts", "qts", Seq("px"),
        strict = strict, toleranceMillis = tol)
      .collect()
      .map(r => r.getAs[Long]("id") -> Option(r.getAs[java.lang.Double]("px")).map(_.doubleValue))
      .toMap

  test("as-of join matches the latest earlier-or-equal right row per key") {
    assert(run() == Map(
      1L -> Some(1.0), 2L -> Some(2.0), 3L -> None,
      4L -> Some(9.0), 5L -> None, 6L -> Some(3.0)))
  }

  test("strict mode excludes the exactly-equal timestamp") {
    val out = run(strict = true)
    assert(out(2L) == Some(1.0)) // 10:00:05 quote no longer eligible
    assert(out(1L) == Some(1.0)) // strictly-earlier matches unchanged
  }

  test("tolerance nulls out stale matches but keeps left rows") {
    val out = run(tol = Some(60_000L)) // 1 minute
    assert(out(6L) == None)            // 29:50 stale → dropped
    assert(out(1L) == Some(1.0))       // 4 s fresh → kept
    assert(out.size == 6)              // left-outer: every trade survives
  }

  test("right rows with null key or null ts never match; null left ts yields null") {
    val q = quotes.unionByName(Seq(
      (null.asInstanceOf[String], ts("2024-01-01 09:00:00"), 111.0),
      ("C", null.asInstanceOf[Timestamp], 222.0)
    ).toDF("qkey", "qts", "px"))
    val t = trades.unionByName(Seq((7L, "A", null.asInstanceOf[Timestamp])).toDF("id", "tkey", "tts"))
    val out = AsOf.asOfJoin(t, q, "tkey", "qkey", "tts", "qts", Seq("px"))
      .collect().map(r => r.getAs[Long]("id") -> Option(r.getAs[java.lang.Double]("px"))).toMap
    assert(out(5L).isEmpty) // C's null-ts quote filtered, still no match
    assert(out(7L).isEmpty) // null left ts → no match, row kept
    assert(out.size == 7)
  }

  test("payload name collision with a left column fails loudly") {
    val e = intercept[IllegalArgumentException](
      AsOf.asOfJoin(trades, quotes.withColumnRenamed("px", "id"),
        "tkey", "qkey", "tts", "qts", Seq("id")))
    assert(e.getMessage.contains("collides"))
  }

  test("parity with the naive inequality-join oracle on random data") {
    val rnd = new scala.util.Random(42)
    val lf = (1 to 300).map(i =>
      (i.toLong, s"k${rnd.nextInt(8)}", ts(f"2024-01-01 10:00:${rnd.nextInt(60)}%02d")))
      .toDF("id", "tkey", "tts")
    // unique (key, ts) on the right — determinism precondition
    val rf = rnd.shuffle((0 until 8).flatMap(k => (0 until 60 by 3).map(s =>
        (s"k$k", ts(f"2024-01-01 10:00:$s%02d"), k * 100.0 + s))))
      .toDF("qkey", "qts", "px")

    val fast = AsOf.asOfJoin(lf, rf, "tkey", "qkey", "tts", "qts", Seq("px"))

    // tiny-data oracle: inequality join + max-ts-per-left-row (the plan that
    // does NOT scale — kept here only to pin semantics)
    val naive: DataFrame = lf.as("l")
      .join(rf.as("r"), col("l.tkey") === col("r.qkey") && col("r.qts") <= col("l.tts"), "left")
      .groupBy(col("l.id"))
      .agg(max(struct(col("r.qts"), col("r.px"))).as("m"))
      .select(col("id"), col("m.px").as("px"))

    val a = fast.select("id", "px").collect().map(r => (r.getLong(0), Option(r.getAs[java.lang.Double]("px")))).toMap
    val b = naive.collect().map(r => (r.getLong(0), Option(r.getAs[java.lang.Double]("px")))).toMap
    assert(a == b)
  }

  test("bucketed variant is result-identical to the unbounded join with the same tolerance") {
    val rnd = new scala.util.Random(7)
    val lf = (1 to 400).map(i =>
      (i.toLong, s"k${rnd.nextInt(5)}", ts(f"2024-01-01 ${10 + rnd.nextInt(3)}%02d:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d")))
      .toDF("id", "tkey", "tts")
    val rf = (0 until 5).flatMap(k => (0 until 170).map(i =>
        (s"k$k", ts(f"2024-01-01 ${10 + i / 60}%02d:${i % 60}%02d:30"), k * 1000.0 + i)))
      .toDF("qkey", "qts", "px")
    val tol = 300_000L // 5 minutes
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "px").collect()
        .map(r => (r.getLong(0), Option(r.getAs[java.lang.Double]("px")))).toMap
    val base = collect(AsOf.asOfJoin(lf, rf, "tkey", "qkey", "tts", "qts", Seq("px"),
      toleranceMillis = Some(tol)))
    for (bucket <- Seq(tol, 2 * tol, 7 * tol)) {
      val bucketed = collect(AsOf.asOfJoinBucketed(lf, rf, "tkey", "qkey", "tts", "qts",
        Seq("px"), toleranceMillis = tol, bucketMillis = bucket))
      assert(bucketed == base, s"bucket=$bucket diverged")
    }
    // strict parity too (equal-timestamp right rows excluded)
    val baseStrict = collect(AsOf.asOfJoin(lf, rf, "tkey", "qkey", "tts", "qts", Seq("px"),
      strict = true, toleranceMillis = Some(tol)))
    val bucketedStrict = collect(AsOf.asOfJoinBucketed(lf, rf, "tkey", "qkey", "tts", "qts",
      Seq("px"), toleranceMillis = tol, bucketMillis = tol, strict = true))
    assert(bucketedStrict == baseStrict)
  }

  test("tieBreak resolves right (key, ts) ties identically to groupBy-max pre-aggregation") {
    val rnd = new scala.util.Random(13)
    val lf = (1 to 300).map(i =>
      (i.toLong, s"k${rnd.nextInt(5)}", ts(f"2024-01-01 10:${rnd.nextInt(50)}%02d:${rnd.nextInt(60)}%02d")))
      .toDF("id", "tkey", "tts")
    // deliberately duplicated (key, ts) rows — several candidate payloads per tick
    val rf = (0 until 5).flatMap(k => (0 until 50).flatMap(m =>
        (0 to rnd.nextInt(3)).map(d => (s"k$k", ts(f"2024-01-01 10:$m%02d:00"), (k * 1000 + m * 10 + d).toDouble))))
      .toDF("qkey", "qts", "px")
    def collect(df: DataFrame) =
      df.select("id", "px").collect()
        .map(r => (r.getLong(0), Option(r.getAs[java.lang.Double]("px")))).toMap
    val preAgg = rf.groupBy("qkey", "qts").agg(max("px").as("px"))
    val tol = 120_000L
    // unbucketed form
    assert(collect(AsOf.asOfJoin(lf, rf, "tkey", "qkey", "tts", "qts", Seq("px"),
        tieBreak = Some("px"))) ==
      collect(AsOf.asOfJoin(lf, preAgg, "tkey", "qkey", "tts", "qts", Seq("px"))))
    // bucketed form
    assert(collect(AsOf.asOfJoinBucketed(lf, rf, "tkey", "qkey", "tts", "qts", Seq("px"),
        toleranceMillis = tol, bucketMillis = tol, tieBreak = Some("px"))) ==
      collect(AsOf.asOfJoinBucketed(lf, preAgg, "tkey", "qkey", "tts", "qts", Seq("px"),
        toleranceMillis = tol, bucketMillis = tol)))
    // tieBreak must be a payload column
    val e = intercept[IllegalArgumentException](
      AsOf.asOfJoin(lf, rf, "tkey", "qkey", "tts", "qts", Seq("px"), tieBreak = Some("nope")))
    assert(e.getMessage.contains("tieBreak"))
  }

  test("bucketed variant rejects a bucket narrower than the tolerance") {
    val e = intercept[IllegalArgumentException](
      AsOf.asOfJoinBucketed(trades, quotes, "tkey", "qkey", "tts", "qts", Seq("px"),
        toleranceMillis = 1000L, bucketMillis = 999L))
    assert(e.getMessage.contains("must cover"))
  }

  test("bucketed plan partitions the window by (key, bucket) — hot-key timelines split") {
    val plan = AsOf.asOfJoinBucketed(trades, quotes, "tkey", "qkey", "tts", "qts", Seq("px"),
        toleranceMillis = 60_000L, bucketMillis = 60_000L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(__graft_asof_k") &&
           plan.contains("__graft_asof_bkt"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("plan shape: one exchange on the key, no cartesian/inequality join") {
    val plan = AsOf.asOfJoin(trades, quotes, "tkey", "qkey", "tts", "qts", Seq("px"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    // EXACTLY one hashpartitioning exchange on the key feeds the window sort
    // (a second one would mean the union's co-partitioning broke and the
    // operator re-shuffles — the cost it exists to avoid)
    assert("hashpartitioning\\(__graft_asof_k".r.findAllIn(plan).size == 1)
    assert(plan.contains("Window"))
  }
}
