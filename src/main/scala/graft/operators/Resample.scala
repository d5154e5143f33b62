package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series resampling onto a regular grid — the `resample`/`asfreq`
  * operation every event-stream analysis needs: bucket events into
  * fixed-width intervals, aggregate per bucket, then FILL THE GAPS so
  * downstream windows see one row per (key, interval) even where nothing
  * happened. Gap rows carry `n_events = 0`, a NULL interval sum, and a
  * last-observation-carried-forward (`filled_value`) column — the standard
  * LOCF imputation.
  *
  * Scale shape: ONE shuffle keys the corpus by (key, bucket) for the
  * interval aggregate; every later step is bucket-table-sized. The grid is
  * generated per key from that aggregate (min/max span → `sequence()`
  * explode — bounded by span/interval, never by event count), left-joined
  * back on (key, bucket), and the LOCF is a per-key running window. Event
  * rows never ride a second exchange.
  *
  * Buckets are epoch-second multiples of `intervalSec` (integer floor
  * division — engine-portable, no timezone or calendar arithmetic), so the
  * DuckDB oracle reproduces the grid exactly.
  */
object Resample {

  /** Per-(keyCols, bucket) resample of `events`:
    * `(keyCols..., bucket, n_events, sum_value, filled_value)`, gap rows
    * included, ordered by nothing (caller sorts). `sum_value` follows the
    * decimal money-sum discipline (order-free, oracle-exact); gaps leave it
    * NULL and `filled_value` carries the last observed sum forward.
    */
  def resample(events: DataFrame, tsCol: String, keyCols: Seq[String],
               valueCol: String, intervalSec: Long): DataFrame = {
    require(intervalSec > 0, s"Resample.resample: intervalSec must be positive, got $intervalSec")
    require(keyCols.nonEmpty, "Resample.resample: at least one key column required")
    (keyCols :+ tsCol :+ valueCol).foreach(c => require(events.columns.contains(c),
      s"Resample.resample: input has no '$c' column"))
    Seq("bucket", "n_events", "sum_value", "filled_value").foreach(c =>
      require(!keyCols.contains(c),
        s"Resample.resample: key column '$c' collides with an output column"))
    import org.apache.spark.sql.expressions.Window

    val keys: Seq[Column] = keyCols.map(col)
    // unix_timestamp truncates sub-second toward zero; positive epochs make
    // that a floor, so both engines land events in the same bucket. Integer
    // `div`, not `/` (the repo-wide exactness discipline — see Tables.load).
    val bucket = org.apache.spark.sql.graftshim.ColumnShim
      .intDiv(unix_timestamp(col(tsCol)), lit(intervalSec)) * intervalSec
    val byBucket = events
      .groupBy((keys :+ bucket.as("bucket")): _*)
      .agg(count(lit(1)).as("n_events"),
        graft.plans.Decimal128.sumMoney(col(valueCol), 6).as("sum_value"))
      // feeds both the span aggregate and the join leg; without the
      // materialization the corpus would bucket-aggregate twice (the
      // Tfidf/Vocab two-consumer trap)
      .localCheckpoint(eager = false)

    val grid = byBucket
      .groupBy(keys: _*)
      .agg(min(col("bucket")).as("__lo"), max(col("bucket")).as("__hi"))
      .select((keys :+
        explode(sequence(col("__lo"), col("__hi"), lit(intervalSec))).as("bucket")): _*)

    val locf = last(col("sum_value"), ignoreNulls = true).over(
      Window.partitionBy(keys: _*).orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    grid.join(byBucket, keyCols :+ "bucket", "left")
      .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
      .withColumn("filled_value", locf)
  }
}
