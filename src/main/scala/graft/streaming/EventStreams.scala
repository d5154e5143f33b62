package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming transforms over the `events` stream.
  *
  * The same aggregations run identically on a batch DataFrame (SparkEntry's
  * `q_events_window` is the batch twin of [[hourlyAgg]]) — the streaming
  * versions just add watermarks for state eviction. On a cluster these are
  * `readStream` → transform → `writeStream` with checkpointing; specs drive
  * them with MemoryStream.
  */
object EventStreams {

  /** Hourly tumbling-window counts/sums per event type. Watermark bounds the
    * state store: late events beyond it are dropped, so state size is
    * O(windows-in-flight × event types), independent of stream length.
    */
  def hourlyAgg(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("event_cnt"),
           sum(col("value")).as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("event_cnt"), col("sum_value"))

  /** Per-user gap sessionization (batch form): a new session starts after
    * `gapMinutes` of inactivity. Uses lag + running sum — one shuffle on
    * user_id, scales with AQE; the streaming twin would use
    * `flatMapGroupsWithState` keyed by user_id.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_millis(col("ts")) - unix_millis(col("prev_ts")) > gapMinutes * 60000L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("new_session")).over(byUser))
      .withColumn("session_id", concat_ws("-", col("user_id"), col("session_seq")))
      .drop("prev_ts", "new_session")
  }
}
