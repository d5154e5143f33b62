package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (String, Long, Double)*) =
    rows.toDF("k", "epoch", "value")
      .withColumn("ts", timestamp_seconds(col("epoch"))).drop("epoch")

  test("gaps fill with n=0, NULL sum, and LOCF carries the last observation") {
    val events = ev(
      ("a", 1000L, 1.5), ("a", 1500L, 2.5), // bucket 0 (hour grid)
      ("a", 7400L, 4.0),                    // bucket 7200 — hour 3600 is a gap
      ("b", 18100L, 7.0))                   // single-bucket key
    val got = Resample.resample(events, "ts", Seq("k"), "value", 3600L)
      .orderBy("k", "bucket")
      .as[(String, Long, Long, Option[Double], Option[Double])].collect()
    assert(got.toSeq == Seq(
      ("a", 0L, 2L, Some(4.0), Some(4.0)),
      ("a", 3600L, 0L, None, Some(4.0)),
      ("a", 7200L, 1L, Some(4.0), Some(4.0)),
      ("b", 18000L, 1L, Some(7.0), Some(7.0))))
  }

  test("grid is per-key: spans do not leak across keys") {
    val events = ev(("a", 0L, 1.0), ("b", 36000L, 2.0))
    val got = Resample.resample(events, "ts", Seq("k"), "value", 3600L)
    // key a spans only its own bucket; key b likewise — no cross product
    assert(got.count() == 2)
  }

  test("events bucket-aggregate ONCE (two consumers read the materialized table)") {
    val events = ev(("a", 0L, 1.0), ("a", 7300L, 2.0))
    val out = Resample.resample(events, "ts", Seq("k"), "value", 3600L)
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("ExistingRDD"), s"expected the checkpointed bucket table:\n$p")
    // the span aggregate and the join leg must both read the checkpoint,
    // not re-aggregate the raw events: exactly one *local* scan of the input
    assert("LocalTableScan".r.findAllIn(p).size <= 1,
      s"raw events scanned more than once:\n$p")
  }

  test("guards: bad interval, missing columns, colliding key name") {
    val events = ev(("a", 0L, 1.0))
    intercept[IllegalArgumentException] {
      Resample.resample(events, "ts", Seq("k"), "value", 0L)
    }
    intercept[IllegalArgumentException] {
      Resample.resample(events, "ts", Seq.empty, "value", 10L)
    }
    intercept[IllegalArgumentException] {
      Resample.resample(events, "nope", Seq("k"), "value", 10L)
    }
    intercept[IllegalArgumentException] {
      Resample.resample(events.withColumnRenamed("k", "bucket"), "ts", Seq("bucket"), "value", 10L)
    }
  }
}
