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

  test("ingest dedup keeps one row per key within the watermark, then evicts state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val events = mem.toDF().toDF("ts", "event_id", "payload")

    val q = EventStreams.dedupedStream(events, Seq("event_id"), watermark = "1 hour")
      .writeStream.format("memory").queryName("deduped").outputMode("append").start()
    try {
      // duplicate deliveries of event 1 within the horizon → ONE survives
      mem.addData(
        (ts("2026-01-01 10:00:00"), 1L, "first"),
        (ts("2026-01-01 10:01:00"), 1L, "retry"),
        (ts("2026-01-01 10:02:00"), 2L, "other"))
      q.processAllAvailable()
      // same key again in the NEXT batch, still inside the horizon → dropped
      mem.addData((ts("2026-01-01 10:30:00"), 1L, "late-retry"))
      q.processAllAvailable()
      val afterNear = spark.table("deduped").filter($"event_id" === 1L).count()
      assert(afterNear == 1L, "duplicate within the watermark horizon must be dropped")

      // advance the watermark far past event 1's time → its state is EVICTED
      mem.addData((ts("2026-01-01 15:00:00"), 3L, "mover"))
      q.processAllAvailable()
      // a re-send beyond the horizon is a new record by contract (state must
      // not grow with keys-ever-seen) — it passes
      mem.addData((ts("2026-01-01 14:30:00"), 1L, "beyond-horizon"))
      q.processAllAvailable()
      assert(spark.table("deduped").filter($"event_id" === 1L).count() == 2L,
        "evicted key must pass again — state may not grow unboundedly")
      assert(spark.table("deduped").count() == 4L)
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
    // ts vintage handling (nanos-as-long vs native micros) exactly like
    // Tables.load — the shared normalizeEventsTs branch
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = graft.Tables.normalizeEventsTs(spark.readStream
      .schema(rawSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir.toString))
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

  test("parquet sink + checkpoint recovery: stop mid-stream, restart, exactly-once parity with batch") {
    // The full deployment shape: file source → hourlyAgg → parquet sink with
    // a checkpoint. The stream is stopped after HALF the input, restarted
    // from the same checkpoint against the remaining files, and the sink must
    // equal the batch twin over the whole input — no lost windows (recovery)
    // and no duplicated windows (exactly-once file commit via _spark_metadata).
    import java.nio.file.{Files, Path, StandardCopyOption}
    val dir   = "/root/testdata/sf0.001"
    val batch = graft.Tables.load(spark, dir, "events")
      .select("ts", "user_id", "event_type", "value")

    val streamDir = Files.createTempDirectory("graft-ckpt-stream")
    val sinkDir   = Files.createTempDirectory("graft-ckpt-sink").resolve("out").toString
    val ckptDir   = Files.createTempDirectory("graft-ckpt-meta").resolve("ckpt").toString

    // Stage a DataFrame as one parquet file inside the watched directory.
    // (Write to a side dir, then move the part file in — a direct write would
    // land _SUCCESS markers and temp dirs in the source's glob space.)
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val side = Files.createTempDirectory(s"graft-stage-$name")
      df.coalesce(1).write.mode("overwrite").parquet(side.resolve("d").toString)
      val part = Files.list(side.resolve("d")).filter(_.getFileName.toString.endsWith(".parquet"))
        .findFirst().get()
      Files.move(part, streamDir.resolve(s"$name.parquet"), StandardCopyOption.ATOMIC_MOVE)
    }

    // Split by TIME — a real stream arrives roughly in event-time order. A
    // value-based split would put half the data behind the watermark the
    // first half already advanced, and the late rows would (correctly) drop.
    val mid = batch.selectExpr("percentile_approx(unix_millis(ts), 0.5) AS m").head().getLong(0)
    val half1 = batch.filter(unix_millis($"ts") <= mid)
    val half2 = batch.filter(unix_millis($"ts") > mid)
    stage(half1, "half1")

    val schema = spark.read.parquet(streamDir.resolve("half1.parquet").toString).schema
    def startQuery() = EventStreams.writeHourlyParquet(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(streamDir.toString),
      sinkDir, ckptDir, watermark = "2 hours")

    val q1 = startQuery()
    val id1 = q1.id
    try { q1.processAllAvailable() } finally q1.stop() // stop mid-stream

    // Remaining input + two sentinel files: the first advances the watermark
    // past every real window, the second triggers the batch that emits them
    // (watermark updates between micro-batches).
    stage(half2, "half2")
    val maxTs = batch.agg(max($"ts")).head().getTimestamp(0)
    val sentinel = Seq((new Timestamp(maxTs.getTime + 30L * 24 * 3600 * 1000),
      -1L, "__sentinel", 0.0)).toDF("ts", "user_id", "event_type", "value")
    stage(sentinel, "sentinel1")
    stage(sentinel, "sentinel2")

    val q2 = startQuery()
    try {
      // Restart really resumed THIS query's checkpoint, not a fresh stream.
      assert(q2.id == id1)
      q2.processAllAvailable()
    } finally q2.stop()

    val streamed = spark.read.parquet(sinkDir)
      .filter($"event_type" =!= "__sentinel")
      .orderBy("hour", "event_type")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val expected = EventStreams.hourlyAgg(batch) // watermark is a no-op in batch
      .orderBy("hour", "event_type")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == expected.toSeq)
  }

  test("partitioned parquet sink lays out partition directories readers can prune") {
    import java.nio.file.{Files, StandardCopyOption}
    val dir   = "/root/testdata/sf0.001"
    val batch = graft.Tables.load(spark, dir, "events")
      .select("ts", "user_id", "event_type", "value")
    val streamDir = Files.createTempDirectory("graft-part-stream")
    val sinkDir   = Files.createTempDirectory("graft-part-sink").resolve("out").toString
    val ckptDir   = Files.createTempDirectory("graft-part-meta").resolve("ckpt").toString
    val side = Files.createTempDirectory("graft-part-stage")
    batch.coalesce(1).write.mode("overwrite").parquet(side.resolve("d").toString)
    val part = Files.list(side.resolve("d")).filter(_.getFileName.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.move(part, streamDir.resolve("all.parquet"), StandardCopyOption.ATOMIC_MOVE)
    val schema = spark.read.parquet(streamDir.resolve("all.parquet").toString).schema
    val q = EventStreams.writeHourlyParquet(
      spark.readStream.schema(schema).parquet(streamDir.toString),
      sinkDir, ckptDir, watermark = "0 seconds", partitionCols = Seq("dt"))
    try q.processAllAvailable() finally q.stop()
    // windows closed by the watermark landed under derived dt=YYYY-MM-DD
    // date-partition dirs (range-prunable by any reader)
    val dirs = new java.io.File(sinkDir).listFiles().map(_.getName).filter(_.startsWith("dt="))
    assert(dirs.nonEmpty)
    assert(dirs.forall(_.matches("dt=\\d{4}-\\d{2}-\\d{2}")), dirs.mkString(","))
    val back = spark.read.parquet(sinkDir)
    assert(back.columns.contains("dt") && back.count() > 0)
    // the derived key is consistent with the window column
    assert(back.filter(org.apache.spark.sql.functions.to_date($"hour") =!= $"dt").count() == 0)
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

  test("the raw-web cleaning chain (HtmlExtract → line rules) runs unchanged in a streaming query") {
    implicit val sqlCtx = spark.sqlContext
    // Both r14 operators are stateless scan expressions, so the whole
    // html→text→line-filter ingest front composes into a stream with no
    // second implementation — the same claim the quality-gate test pins.
    val mem = MemoryStream[(Long, String)]
    val pages = mem.toDF().toDF("doc_id", "html")
    val cleaned = graft.operators.Lines.filterLinesFast(
      graft.operators.HtmlExtract.extract(pages),
      graft.plans.FilterLines.LineRules(blockWords = Seq("spam")),
      idCol = "doc_id", textCol = "html")
    val q = cleaned.writeStream.format("memory").queryName("cleaned_pages")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, "<nav><a href='/'>Home</a> <a href='/x'>About link here</a></nav>" +
          "<p>real content paragraph with plenty of words here.</p>" +
          "<p>spam filled paragraph with plenty of words to pass gates.</p>" +
          "<script>x()</script>"),
        (2L, "<p>short</p>"))
      q.processAllAvailable()
      val out = spark.table("cleaned_pages")
        .select("doc_id", "html", "n_blocks", "n_kept", "n_lines_kept", "n_lines_dropped")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
        .toSeq.sortBy(_._1)
      assert(out == Seq(
        (1L, "real content paragraph with plenty of words here.", 3L, 2L, 1L, 1L),
        (2L, "", 1L, 0L, 1L, 0L)))
    } finally q.stop()
  }

  test("the batch text-quality expressions run unchanged inside a streaming query") {
    implicit val sqlCtx = spark.sqlContext
    // The whole curation scoring layer is stateless scan projections, so the
    // SAME native expressions gate a stream without modification — ingest
    // filtering doesn't need a second implementation.
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    // including the model-based classifier (round 11): a trained
    // hashed-ngram model gates the stream through the same native expression
    val model = graft.operators.QualityClassifier.trainLocal(
      Seq(("the quick fox and the dog", true),
          ("der hund und die katze", false),
          ("in the yard it is", true),
          ("das haus nicht heute", false)), d = 256, epochs = 15)
    val gated = docs
      .withColumn("norm", graft.functions.TextFunctions.normalizeText(col("text")))
      .withColumn("lang", graft.functions.TextFunctions.langId(col("norm")))
      .withColumn("quality", graft.functions.TextFunctions.qualityScore(col("norm")))
      .withColumn("clf", graft.plans.TextExpressions.hashedNgramLogit(
        col("norm"), model.weightsMilli, model.includeBigrams))
      .filter(col("lang") === "en" && col("quality") > 0.2 &&
        (lit(model.biasMilli) + col("clf.sum_wmilli")) > 0)
    val q = gated.writeStream.format("memory").queryName("gated_docs")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, "  The QUICK fox and the dog is to of it in   the yard  "),
        (2L, "der hund und die katze und das haus nicht heute"),
        (3L, "zz"))
      q.processAllAvailable()
      val out = spark.table("gated_docs").select("doc_id", "lang")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(out == Seq((1L, "en")))
    } finally q.stop()
  }
}
