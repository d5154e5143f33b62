package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val purchases = Seq(
    (1L, "A", ts("2024-01-01 10:30:00")),
    (2L, "A", ts("2024-01-01 12:00:00")),
    (3L, "B", ts("2024-01-01 10:30:00"))
  ).toDF("pid", "pkey", "pts")

  private lazy val views = Seq(
    (10L, "A", ts("2024-01-01 09:29:59")), // > 1h before purchase 1 → out
    (11L, "A", ts("2024-01-01 09:30:00")), // exactly 1h before → lower-exclusive, out
    (12L, "A", ts("2024-01-01 09:30:01")), // just inside
    (13L, "A", ts("2024-01-01 10:30:00")), // equal ts → upper-inclusive, in
    (14L, "A", ts("2024-01-01 11:30:00")), // after p1, inside p2's window
    (15L, "B", ts("2024-01-01 10:00:00"))  // other key
  ).toDF("vid", "vkey", "vts")

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("pid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("bounded range join emits exactly the pairs in (t-lookback, t]") {
    val out = pairs(RangeJoin.bounded(purchases, views, "pkey", "vkey", "pts", "vts",
      lookbackMillis = 3600_000L, payload = Seq("vid")))
    assert(out == Set((1L, 12L), (1L, 13L), (2L, 14L), (3L, 15L)))
  }

  test("parity with the naive inequality join on random data (incl. bucket-boundary straddles)") {
    val rnd = new scala.util.Random(11)
    val lf = (1 to 250).map(i =>
      (i.toLong, s"k${rnd.nextInt(6)}", ts(f"2024-01-01 ${10 + rnd.nextInt(4)}%02d:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d")))
      .toDF("pid", "pkey", "pts")
    val rf = (1 to 500).map(i =>
      (1000L + i, s"k${rnd.nextInt(6)}", ts(f"2024-01-01 ${9 + rnd.nextInt(5)}%02d:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d")))
      .toDF("vid", "vkey", "vts")
    val look = 17 * 60 * 1000L // deliberately not a divisor of the data's spread

    val banded = pairs(RangeJoin.bounded(lf, rf, "pkey", "vkey", "pts", "vts", look, Seq("vid")))
    val naive = pairs(lf.join(rf,
      col("pkey") === col("vkey") &&
      unix_micros(col("vts")) > unix_micros(col("pts")) - look * 1000L &&
      unix_micros(col("vts")) <= unix_micros(col("pts"))))
    assert(banded == naive, s"banded ${banded.size} pairs vs naive ${naive.size}")
  }

  test("each pair appears exactly once despite right-row replication") {
    val out = RangeJoin.bounded(purchases, views, "pkey", "vkey", "pts", "vts",
        3600_000L, Seq("vid"))
      .groupBy("pid", "vid").count().filter(col("count") > 1)
    assert(out.isEmpty)
  }

  test("plan is an equi-join on (key, bucket), not a nested-loop range join") {
    val plan = RangeJoin.bounded(purchases, views, "pkey", "vkey", "pts", "vts",
        3600_000L, Seq("vid"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    assert(plan.contains("__graft_range_k") && plan.contains("__graft_range_bkt"))
  }

  test("right timestamp sharing a left column name fails loudly") {
    val e = intercept[IllegalArgumentException](
      RangeJoin.bounded(purchases, views.withColumnRenamed("vts", "pts"),
        "pkey", "vkey", "pts", "pts", 1000L, Seq("vid")))
    assert(e.getMessage.contains("collide"))
  }
}
