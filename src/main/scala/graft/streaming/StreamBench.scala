package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming performance harness: replays the events table through a file
  * source (time-sliced parquet chunks arriving oldest-first, the shape of a
  * landing-zone ingest) and measures the two production streaming paths:
  *
  *  - [[EventStreams.writeHourlyParquet]] — watermarked hourly windows into
  *    an exactly-once parquet sink with checkpointing (the deployment shape)
  *  - [[EventStreams.dedupedStream]] — `dropDuplicatesWithinWatermark`
  *    delivery dedup, the stateful ingest front door
  *
  * plus checkpoint recovery: the hourly query is stopped after half the
  * input, restarted against the full directory, and the time from restart
  * to (a) the first committed batch and (b) full catch-up is reported.
  *
  * Correctness of both transforms (batch parity, exactly-once across
  * restart, state eviction) is pinned in StreamingSpec; this main measures
  * only. One JSON line out, BENCH-style:
  * `runMain graft.streaming.StreamBench` with SPARK_GRAFT_SF_DIR (default
  * /root/testdata/sf0.1), SPARK_GRAFT_STREAM_FILES (time slices, default
  * 32), SPARK_GRAFT_STREAM_FPT (files per trigger, default 4).
  */
object StreamBench {

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete(): Unit
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nFiles = sys.env.getOrElse("SPARK_GRAFT_STREAM_FILES", "32").toInt
    val fpt = sys.env.getOrElse("SPARK_GRAFT_STREAM_FPT", "4").toInt
    val spark = graft.Tables.harnessSessionFor(sfDir)
    spark.sparkContext.setLogLevel("WARN")

    val work = java.nio.file.Files.createTempDirectory("graft-streambench").toFile
    try {
      // ---- stage: time-sliced chunk files, mtime ascending with slice ----
      // repartitionByRange orders output parts by ts range, so part-00000 is
      // the earliest slice; FileStreamSource batches oldest-mtime-first, so
      // explicit ascending mtimes replay the stream in event-time order
      // (bounded late data -> the 2h watermark never mass-drops).
      val staged = new java.io.File(work, "sliced")
      val ev = graft.Tables.load(spark, sfDir, "events")
      ev.repartitionByRange(nFiles, col("ts")).write.parquet(staged.toString)
      val parts = staged.listFiles().filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      val srcDir = new java.io.File(work, "src"); srcDir.mkdirs()
      val base = System.currentTimeMillis() - 1000L * (parts.length + 10)
      parts.zipWithIndex.foreach { case (p, i) =>
        val dst = new java.io.File(srcDir, f"slice$i%05d.parquet")
        java.nio.file.Files.copy(p.toPath, dst.toPath)
        dst.setLastModified(base + i * 1000L): Unit
      }
      val totalRows = ev.count()
      val schema = spark.read.parquet(srcDir.toString).schema
      var sessionsLine = ""
      def fmt(v: Double): String =
        BigDecimal(v).setScale(1, BigDecimal.RoundingMode.HALF_UP).toString

      def source(s: SparkSession) = graft.Tables.normalizeEventsTs(
        s.readStream.schema(schema)
          .option("maxFilesPerTrigger", fpt.toString)
          .parquet(srcDir.toString))

      def medianRate(q: org.apache.spark.sql.streaming.StreamingQuery): Double = {
        val rates = q.recentProgress.toSeq.map(_.processedRowsPerSecond)
          .filter(r => !r.isNaN && r > 0).sorted
        if (rates.isEmpty) 0.0 else rates(rates.size / 2)
      }

      // ---- 1. hourly windows -> exactly-once parquet sink ----------------
      val outHourly = new java.io.File(work, "out_hourly").toString
      val ckptHourly = new java.io.File(work, "ckpt_hourly").toString
      val t0 = System.nanoTime()
      val q1 = EventStreams.writeHourlyParquet(source(spark), outHourly, ckptHourly)
      q1.processAllAvailable()
      val hourlySec = (System.nanoTime() - t0) / 1e9
      val hourlyBatchRate = medianRate(q1)
      q1.stop()

      // ---- 2. watermarked delivery dedup -> noop sink --------------------
      val ckptDedup = new java.io.File(work, "ckpt_dedup").toString
      val t1 = System.nanoTime()
      val q2 = EventStreams.dedupedStream(source(spark), Seq("event_id"))
        .writeStream.format("noop")
        .option("checkpointLocation", ckptDedup)
        .start()
      q2.processAllAvailable()
      val dedupSec = (System.nanoTime() - t1) / 1e9
      val dedupBatchRate = medianRate(q2)
      q2.stop()

      // ---- 2b. the same dedup on the RocksDB state store -----------------
      // The 100 TB state path: HDFS-backed stores hold state on-heap (every
      // key resident in the executor JVM — a day of 10^9 event-ids OOMs),
      // RocksDB spills to local SSD with constant heap. Same query, same
      // data; the delta is the state-backend constant a deployment pays for
      // state that outgrows memory.
      val ckptDedupR = new java.io.File(work, "ckpt_dedup_rocks").toString
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val t1b = System.nanoTime()
      val q2b = EventStreams.dedupedStream(source(spark), Seq("event_id"))
        .writeStream.format("noop")
        .option("checkpointLocation", ckptDedupR)
        .start()
      q2b.processAllAvailable()
      val dedupRocksSec = (System.nanoTime() - t1b) / 1e9
      val dedupRocksBatchRate = medianRate(q2b)
      q2b.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

      // ---- 2c. streaming sessionization (flatMapGroupsWithState) ---------
      // The stream-shaped form of q_sessionize: batch pays a full sort per
      // run (the measured sf100 floor); the stream pays per-key state
      // updates as events arrive and never re-sorts history — this row is
      // the amortization evidence beside the batch number. Same replayed
      // slices; watermark wide enough that the replay's time-compressed
      // arrival never mass-drops.
      {
        import spark.implicits._
        val ckptSess = new java.io.File(work, "ckpt_sess").toString
        val t1c = System.nanoTime()
        val sessIn = source(spark)
          .select(col("ts").cast("timestamp").as("ts"), col("user_id"))
          .where(col("user_id").isNotNull)
          .as[EventStreams.Event]
        val q2c = EventStreams.streamingSessions(sessIn, gapMinutes = 30,
            watermark = "24 hours")
          .writeStream.format("noop")
          .option("checkpointLocation", ckptSess)
          .start()
        q2c.processAllAvailable()
        val sessSec = (System.nanoTime() - t1c) / 1e9
        val sessBatchRate = medianRate(q2c)
        q2c.stop()
        sessionsLine = s""""sessions_sec":${fmt(sessSec)},"sessions_rows_per_sec":${
          fmt(totalRows / sessSec)},"sessions_batch_rows_per_sec":${fmt(sessBatchRate)},"""
      }

      // ---- 3. checkpoint recovery ----------------------------------------
      // First half of the slices through a fresh checkpointed query, stop;
      // reveal the rest; restart and time (a) first committed batch — the
      // recovery overhead a production restart pays before new output
      // appears — and (b) full catch-up over the second half.
      val halfDir = new java.io.File(work, "src_half"); halfDir.mkdirs()
      val half = parts.length / 2
      (0 until half).foreach { i =>
        val src = new java.io.File(srcDir, f"slice$i%05d.parquet")
        java.nio.file.Files.copy(src.toPath,
          new java.io.File(halfDir, src.getName).toPath)
      }
      def halfSource(s: SparkSession) = graft.Tables.normalizeEventsTs(
        s.readStream.schema(schema)
          .option("maxFilesPerTrigger", fpt.toString)
          .parquet(halfDir.toString))
      val outRec = new java.io.File(work, "out_rec").toString
      val ckptRec = new java.io.File(work, "ckpt_rec").toString
      val qa = EventStreams.writeHourlyParquet(halfSource(spark), outRec, ckptRec)
      qa.processAllAvailable(); qa.stop()
      (half until parts.length).foreach { i =>
        val src = new java.io.File(srcDir, f"slice$i%05d.parquet")
        java.nio.file.Files.copy(src.toPath,
          new java.io.File(halfDir, src.getName).toPath)
      }
      val t2 = System.nanoTime()
      val qb = EventStreams.writeHourlyParquet(halfSource(spark), outRec, ckptRec)
      var firstCommit = -1.0
      while (firstCommit < 0 && (System.nanoTime() - t2) / 1e9 < 300) {
        if (qb.recentProgress.exists(_.numInputRows > 0))
          firstCommit = (System.nanoTime() - t2) / 1e9
        else Thread.sleep(20)
      }
      qb.processAllAvailable()
      val catchupSec = (System.nanoTime() - t2) / 1e9
      qb.stop()

      val line =
        s"""{"metric":"stream_bench","sf":"$sfDir","rows":$totalRows,"files":${parts.length},"files_per_trigger":$fpt,""" +
        s""""hourly_sink_sec":${fmt(hourlySec)},"hourly_rows_per_sec":${fmt(totalRows / hourlySec)},"hourly_batch_rows_per_sec":${fmt(hourlyBatchRate)},""" +
        s""""dedup_sec":${fmt(dedupSec)},"dedup_rows_per_sec":${fmt(totalRows / dedupSec)},"dedup_batch_rows_per_sec":${fmt(dedupBatchRate)},""" +
        s""""dedup_rocksdb_sec":${fmt(dedupRocksSec)},"dedup_rocksdb_rows_per_sec":${fmt(totalRows / dedupRocksSec)},"dedup_rocksdb_batch_rows_per_sec":${fmt(dedupRocksBatchRate)},""" +
        sessionsLine +
        s""""recovery_first_commit_sec":${fmt(firstCommit)},"recovery_catchup_sec":${fmt(catchupSec)}}"""
      println(line)
    } finally {
      deleteRec(work)
      spark.stop()
    }
  }
}
