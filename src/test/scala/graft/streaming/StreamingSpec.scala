package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming hourly agg with watermark matches the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String, Double)]
    val events = mem.toDF().toDF("ts", "user_id", "event_type", "value")

    val q = EventStreams.hourlyAgg(events, watermark = "2 hours")
      .writeStream.format("memory").queryName("hourly").outputMode("complete").start()
    try {
      mem.addData(
        (ts("2026-01-01 10:05:00"), 1L, "click", 1.0),
        (ts("2026-01-01 10:55:00"), 2L, "click", 2.0),
        (ts("2026-01-01 11:10:00"), 1L, "view", 5.0))
      q.processAllAvailable()
      val out = spark.table("hourly").orderBy("hour", "event_type")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(out.toSeq == Seq(
        ("2026-01-01 10:00:00.0", "click", 2L, 3.0),
        ("2026-01-01 11:00:00.0", "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("file readStream over the real events table matches the batch aggregation") {
    // readStream → transform → writeStream on the driver-provided parquet:
    // the streaming plan must produce exactly the batch q_events_window result.
    val dir   = "/root/testdata/sf0.001"
    val batch = graft.Tables.load(spark, dir, "events")
    // file streams want a DIRECTORY of files; stage the parquet into one
    val streamDir = java.nio.file.Files.createTempDirectory("graft-events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    // the raw parquet stores ts as TIMESTAMP(NANOS) → read as long + convert,
    // exactly like Tables.load
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = spark.readStream
      .schema(rawSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir.toString)
      .withColumn("ts", timestamp_micros((col("ts") / lit(1000L)).cast("long")))
    val q = EventStreams.hourlyAgg(stream, watermark = "10 years") // keep all windows for the compare
      .writeStream.format("memory").queryName("file_hourly").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("file_hourly")
        .orderBy("hour", "event_type")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      // the SAME hourlyAgg transform run as a plain batch query — the
      // batch/streaming-twin claim, compared field-for-field
      val batchRows = EventStreams.hourlyAgg(batch)
        .orderBy("hour", "event_type")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(streamed.toSeq == batchRows.toSeq)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("sessionize splits on gaps > 30 min per user") {
    val df = Seq(
      (ts("2026-01-01 09:00:00"), 1L),
      (ts("2026-01-01 09:10:00"), 1L), // same session
      (ts("2026-01-01 10:00:00"), 1L), // 50-min gap → new session
      (ts("2026-01-01 09:00:00"), 2L)
    ).toDF("ts", "user_id")
    val out = EventStreams.sessionize(df)
      .groupBy("user_id").agg(max("session_seq").as("n_sessions"))
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 2L), (2L, 1L)))
  }
}
