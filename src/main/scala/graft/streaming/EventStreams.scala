package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Structured Streaming transforms over the `events` stream.
  *
  * The same aggregations run identically on a batch DataFrame (SparkEntry's
  * `q_events_window` is the batch twin of [[hourlyAgg]]) — the streaming
  * versions just add watermarks for state eviction. On a cluster these are
  * `readStream` → transform → `writeStream` with checkpointing; specs drive
  * them with MemoryStream.
  */
object EventStreams {

  /** One policy, two entry points: [[hourlyAgg]] and [[writeHourlyParquet]]
    * share this default so the sink can never silently drift from the
    * transform it deploys.
    */
  val DefaultWatermark = "2 hours"

  /** Hourly tumbling-window counts/sums per event type. Watermark bounds the
    * state store: late events beyond it are dropped, so state size is
    * O(windows-in-flight × event types), independent of stream length.
    */
  def hourlyAgg(events: DataFrame, watermark: String = DefaultWatermark): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("event_cnt"),
           sum(col("value")).as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("event_cnt"), col("sum_value"))

  /** Production sink for [[hourlyAgg]]: exactly-once parquet output with
    * checkpoint-based recovery — the `readStream → transform → writeStream`
    * deployment shape of the reference's stream utilities
    * (reference: src/utils/stream.ts, tests/stream.test.ts).
    *
    * Durability contract: offsets + window state live in `checkpointDir`
    * (WAL + HDFS/object-store state store) and the parquet sink's
    * `_spark_metadata` log records exactly which files each committed batch
    * wrote — a crash or stop between batches resumes from the last committed
    * offsets and re-plans the in-flight batch. Exactly-once holds for
    * readers that honor the metadata log (Spark reads of the sink): they see
    * only committed files. A crash mid-batch can leave ORPHAN part files the
    * log never references — a non-Spark reader scanning raw files (Trino,
    * Hive, DuckDB over the directory) can see those windows twice; run a
    * log-driven compaction/cleanup before handing the directory to such
    * readers. Append mode + the watermark means each hourly window is
    * committed once, when the watermark passes it; state is evicted then, so
    * a restart replays only the windows still open at the stop point. At
    * 100 TB/day pass `partitionCols = Seq("dt")`: the sink derives
    * `dt = to_date(hour)` and lays out true date partitions
    * (`dt=2026-08-12/`) external engines can range-prune. Partitioning
    * directly on `hour` also works but yields 24 URL-escaped timestamp dirs
    * per day, which date-pruning tooling handles poorly.
    */
  def writeHourlyParquet(events: DataFrame, outDir: String, checkpointDir: String,
                         watermark: String = DefaultWatermark,
                         trigger: Trigger = Trigger.ProcessingTime(0L),
                         partitionCols: Seq[String] = Nil): StreamingQuery = {
    val agg = hourlyAgg(events, watermark)
    val out = if (partitionCols.contains("dt") && !agg.columns.contains("dt"))
      agg.withColumn("dt", to_date(col("hour"))) else agg
    val w = out
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append") // windowed agg + watermark → each window finalized once
      .trigger(trigger)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).start()
  }

  /** Streaming exact dedup at ingest — the streaming twin of `Dedup.exact`.
    *
    * `dropDuplicatesWithinWatermark` keeps ONE row per key among duplicates
    * arriving within the watermark horizon, and — the property that matters
    * at 100 TB/day — EVICTS a key's state once the watermark passes its
    * event time, so state is O(keys-per-horizon), not O(keys-ever-seen)
    * (plain `dropDuplicates` on a stream grows state forever). The contract
    * is exactly an ingest pipeline's: duplicate deliveries cluster in time
    * (retries, at-least-once sources); a re-send beyond the horizon is
    * indistinguishable from a new record and passes — downstream batch dedup
    * (`Dedup.exact`) remains the corpus-level backstop.
    *
    * `keyCols` chooses the identity: `event_id` for delivery dedup, a
    * content hash (`sha2(text, 256)`) for document-content dedup.
    */
  def dedupedStream(events: DataFrame, keyCols: Seq[String],
                    watermark: String = DefaultWatermark): DataFrame = {
    require(keyCols.nonEmpty, "dedupedStream: need at least one key column")
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)
  }

  /** One event on the wire for [[streamingSessions]]. */
  final case class Event(ts: java.sql.Timestamp, user_id: Long)

  /** Accumulating per-user session state. */
  final case class SessionState(sessionStartMs: Long, lastMs: Long, nEvents: Long)

  /** A closed session emitted downstream. */
  final case class ClosedSession(user_id: Long, startMs: Long, endMs: Long, nEvents: Long)

  /** Streaming gap sessionization with custom state —
    * `flatMapGroupsWithState` keyed by user, event-time timeout: a session
    * closes when a later event exceeds the gap in-stream, or when the
    * watermark passes `lastEvent + gap` (state is then evicted, so per-key
    * memory is bounded and late stragglers beyond the watermark are dropped —
    * the same contract as watermarked window aggs). Streaming twin of
    * [[sessionize]].
    */
  def streamingSessions(events: Dataset[Event], gapMinutes: Int = 30,
                        watermark: String = "1 hour"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(ClosedSession(userId, s.sessionStartMs, s.lastMs, s.nEvents))
          } else {
            // drop events at/below the watermark explicitly —
            // flatMapGroupsWithState does NOT filter them (only aggs do), and
            // processing one could re-emit an overlapping session for an
            // interval already closed by timeout
            val wm0 = state.getCurrentWatermarkMs()
            val sorted = batch.map(_.ts.getTime).filter(t => wm0 <= 0 || t > wm0).toSeq.sorted
            var closed = List.empty[ClosedSession]
            var cur    = state.getOption
            // Stragglers more than a gap OLDER than the live session form
            // their own (already-over) session(s): sorted ascending, they
            // chain with each other exactly like the batch twin, closing when
            // the next event breaks the gap or rejoins the live window.
            var old: Option[SessionState] = None
            def flushOld(): Unit = old.foreach { o =>
              closed ::= ClosedSession(userId, o.sessionStartMs, o.lastMs, o.nEvents)
              old = None
            }
            sorted.foreach { t =>
              cur match {
                case Some(s) if t < s.sessionStartMs - gapMs =>
                  old match {
                    case Some(o) if t - o.lastMs <= gapMs =>
                      old = Some(o.copy(lastMs = t, nEvents = o.nEvents + 1))
                    case _ =>
                      flushOld()
                      old = Some(SessionState(t, t, 1))
                  }
                case Some(s) if t - s.lastMs <= gapMs =>
                  // if the straggler chain connects to this event within the
                  // gap, the whole chain belongs to the live session (the
                  // batch twin would merge them) — absorb instead of closing
                  old match {
                    case Some(o) if t - o.lastMs <= gapMs =>
                      cur = Some(SessionState(
                        math.min(s.sessionStartMs, o.sessionStartMs),
                        math.max(s.lastMs, t), s.nEvents + o.nEvents + 1))
                      old = None
                    case _ =>
                      flushOld()
                      // late (out-of-order but above-watermark) events must
                      // never move the session window backward
                      cur = Some(SessionState(
                        math.min(s.sessionStartMs, t), math.max(s.lastMs, t), s.nEvents + 1))
                  }
                case Some(s) =>
                  flushOld()
                  closed ::= ClosedSession(userId, s.sessionStartMs, s.lastMs, s.nEvents)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            flushOld()
            cur.foreach { s =>
              state.update(s)
              // flatMapGroupsWithState does NOT drop late rows (only aggs do):
              // a straggler can put lastMs+gap below the current watermark,
              // and setTimeoutTimestamp would throw and kill the query —
              // clamp to just past the watermark instead.
              val wm = state.getCurrentWatermarkMs()
              state.setTimeoutTimestamp(math.max(s.lastMs + gapMs, wm + 1))
            }
            closed.reverseIterator
          }
        })
  }

  /** Per-user gap sessionization (batch form): a new session starts after
    * `gapMinutes` of inactivity. Uses lag + running sum — one shuffle on
    * user_id, scales with AQE; the streaming twin would use
    * `flatMapGroupsWithState` keyed by user_id.
    *
    * Scale notes (r19 decomposition, BASELINE.md): the cost is the
    * exchange+SORT, not the two window passes (sf10: sort floor 1.25 s,
    * both windows +0.25 s). Events stored bucketed by user_id
    * ([[graft.operators.Bucketing.writeBucketed]]) satisfy the window's
    * hash requirement and eliminate the exchange entirely (measured:
    * jobs 2→1) — network saved at cluster scale, though the per-user sort
    * remains the single-node floor either way.
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
