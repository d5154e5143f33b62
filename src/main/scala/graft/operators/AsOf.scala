package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (point-in-time) join: for every left row, attach the payload of the
  * latest right row with the same key whose timestamp is `<=` (or `<` when
  * `strict`) the left timestamp — the temporal join behind feature lookups,
  * slowly-changing-dimension reads, and "state at event time" queries. The
  * reference has no aggregation/temporal surface at all (staticql README
  * "Not the right tool for"); this is part of graft's analytics extension,
  * expressed the Spark-first way.
  *
  * Plan shape (the 100 TB-safe one): tag both sides, union, ONE shuffle on
  * the key, in-partition sort by `(ts, side)`, and a running
  * `last(payload, ignoreNulls)` window. Cost is O((|L|+|R|) log p) — a
  * sort-based prefix scan. The naive alternative, an inequality join
  * (`l.key = r.key AND r.ts <= l.ts` + max-per-row), explodes to O(|L|·|R|)
  * pairs per key under Spark's range-join planning and cannot survive scale;
  * it exists here only as the spec's tiny-data oracle.
  *
  * Determinism: right rows must be unique per `(key, ts)`, OR a `tieBreak`
  * payload column must be named — ties then resolve to the WHOLE row with
  * the greatest tie-break value inside the window sort the join already
  * pays. Pre-aggregating the right side (`groupBy(key, ts).agg(max(...))`)
  * matches this only for a SINGLE payload column; with several, per-column
  * max mixes values across tied rows while tieBreak stays row-consistent
  * (one winning row's values together). Fully deterministic output further
  * requires the tie-break value itself to be unique per `(key, ts)`: rows
  * tied on `(key, ts, tieBreak)` but differing elsewhere still resolve
  * sort-order-dependently.
  *
  * Nulls: right rows with a null key or null timestamp can never match and
  * are filtered; left rows always survive (left-outer semantics) — a null
  * left timestamp sorts before every right row and yields a null match.
  *
  * Skew: one key's full timeline sorts within one task. For a hot key with a
  * bounded-staleness requirement, [[asOfJoinBucketed]] partitions by
  * `(key, time bucket)` instead — same results (parity-tested), partition
  * count scales with time instead of keys. The unbounded-lookback form below
  * is the general case.
  */
object AsOf {

  private val K = "__graft_asof_k"
  private val TS = "__graft_asof_ts"
  private val SIDE = "__graft_asof_side"
  private val L = "__graft_asof_l"
  private val R = "__graft_asof_r"
  private val M = "__graft_asof_m"

  /** @param payload   right columns to carry onto matched left rows (must not
    *                  collide with left column names)
    * @param strict    `true` → match strictly-earlier right rows only
    * @param toleranceMillis max age of a match: right rows older than
    *                  `leftTs - tolerance` yield null payloads instead
    * @param tieBreak  payload column resolving right-side `(key, ts)` ties:
    *                  the row with the GREATEST tie-break value wins. Without
    *                  it, right rows must be unique per `(key, ts)` — callers
    *                  pre-aggregate (`groupBy(key, ts).agg(max(...))`), which
    *                  costs an extra shuffle of the right side; the tie-break
    *                  folds that dedup into the window sort the join already
    *                  pays (and, unlike per-column max over several payload
    *                  columns, keeps the winning row's values together; pick
    *                  a tie-break unique per `(key, ts)` for full
    *                  determinism). Parity pinned by AsOfSpec. Trade-off, measured at
    *                  sf1: on a HOT key the pre-agg's map-side combine is
    *                  itself the skew mitigation (it collapses the hot
    *                  timeline before the per-key window shuffle; tieBreak
    *                  sorts it in one task — 1.9 s vs 1.4 s on the planted
    *                  22.5%-hot orders key). Prefer tieBreak on the bucketed
    *                  variant (time-splitting absorbs the skew: 1.6 → 1.1 s)
    *                  or when ties aren't skew-concentrated.
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      strict: Boolean = false,
      toleranceMillis: Option[Long] = None,
      tieBreak: Option[String] = None): DataFrame =
    core("asOfJoin", left, right, leftKey, rightKey, leftTs, rightTs,
      payload, strict, toleranceMillis, bucketMillis = None, tieBreak)

  private val BKT = "__graft_asof_bkt"

  /** Bounded-staleness as-of join partitioned by `(key, time bucket)` — the
    * skew-safe scale path. With a match tolerance `T` and bucket width
    * `B >= T`, a left row at `t` can only match right rows in `[t-T, t]`,
    * which live in `bucket(t)` or `bucket(t)-1`; so each right row is
    * replicated into its own and the following bucket and the running-last
    * window runs per `(key, bucket)`. A hot key's timeline now splits across
    * `time-range / B` partitions instead of sorting in one task, at the cost
    * of ≤2× the (narrow, payload-only) right rows in the shuffle. Results
    * are identical to `asOfJoin(..., toleranceMillis = Some(tol))` — pinned
    * by AsOfSpec parity.
    */
  def asOfJoinBucketed(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      toleranceMillis: Long,
      bucketMillis: Long,
      strict: Boolean = false,
      tieBreak: Option[String] = None): DataFrame = {
    require(toleranceMillis > 0, "asOfJoinBucketed: tolerance must be positive")
    require(bucketMillis >= toleranceMillis,
      s"asOfJoinBucketed: bucket width ($bucketMillis ms) must cover the tolerance ($toleranceMillis ms) — a match can span at most one bucket boundary")
    core("asOfJoinBucketed", left, right, leftKey, rightKey, leftTs, rightTs,
      payload, strict, Some(toleranceMillis), Some(bucketMillis), tieBreak)
  }

  /** Shared tag→union→running-last pipeline; `bucketMillis` switches between
    * the unbounded per-key window and the `(key, bucket)` bounded form with
    * right-row replication into the following bucket.
    */
  private def core(
      opName: String,
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      strict: Boolean,
      toleranceMillis: Option[Long],
      bucketMillis: Option[Long],
      tieBreak: Option[String]): DataFrame = {
    require(payload.nonEmpty, s"$opName: payload must name at least one right column")
    tieBreak.foreach(t => require(payload.contains(t),
      s"$opName: tieBreak '$t' must be one of the payload columns"))
    val leftCols = left.columns.toSeq
    val clash = payload.toSet.intersect(leftCols.toSet)
    require(clash.isEmpty, s"$opName: payload collides with left columns: ${clash.mkString(", ")}")
    require(
      left.schema(leftTs).dataType == right.schema(rightTs).dataType,
      s"$opName: timestamp types differ: ${left.schema(leftTs).dataType} vs ${right.schema(rightTs).dataType}")

    // Integer `div` on micros: exact at every magnitude (double `/` is exact
    // only below 2^53 ≈ year 2255 in micros). `div` truncates toward zero, so
    // bucket 0 spans (-B, B) for pre-1970 data — harmless: banding only needs
    // consistent bucketing plus the replicate-into-next-bucket adjacency,
    // both of which hold for a double-width bucket (tolerance ≤ B still
    // reaches at most one boundary back).
    def bucketOf(ts: org.apache.spark.sql.Column, widthMillis: Long) =
      org.apache.spark.sql.graftshim.ColumnShim.intDiv(
        unix_micros(ts), lit(widthMillis * 1000L))

    // The match struct always carries the right timestamp (first field) so the
    // tolerance check can read it even when the caller didn't ask for it.
    val carried = (rightTs +: payload.filterNot(_ == rightTs)).toIndexedSeq
    val lStruct = StructType(left.schema.fields)
    val rStruct = StructType(carried.map(right.schema(_)))

    def bucketCol(ts: String): Seq[(org.apache.spark.sql.Column)] =
      bucketMillis.map(b => bucketOf(col(ts), b).as(BKT)).toSeq

    val lTagged = left.select(
      Seq(struct(leftCols.map(col): _*).as(L), col(leftKey).as(K)) ++
      bucketCol(leftTs) ++ Seq(
        col(leftTs).as(TS),
        lit(1).as(SIDE),
        lit(null).cast(rStruct).as(R)): _*)
    // side ordering does the inclusivity: at an equal timestamp, right rows
    // sort before left (0 < 1, inclusive) or after (2 > 1, strict-excluded).
    val rBase = right
      .filter(col(rightKey).isNotNull && col(rightTs).isNotNull)
      .select(
        Seq(lit(null).cast(lStruct).as(L), col(rightKey).as(K)) ++
        bucketCol(rightTs) ++ Seq(
          col(rightTs).as(TS),
          lit(if (strict) 2 else 0).as(SIDE),
          struct(carried.map(col): _*).as(R)): _*)
    // Bucketed form: bucket b's right rows must also serve bucket b+1's
    // early left rows (a match may reach one boundary back). Only ONE of
    // them can ever win there — the bucket's last right row under the
    // window's own ordering — so instead of replicating ALL right rows
    // into b+1 (the pre-r15 explode form, which shipped and sorted 2|R|
    // rows), a partial-aggregating max_by reduces each (key, bucket) to
    // its single boundary row and shifts that into b+1. The big exchange
    // then carries |L| + |R| + G rows (G = #(key,bucket) groups) and the
    // boundary aggregate's own exchange carries G post-combine rows. The
    // right subtree does evaluate twice (union + aggregate) — a narrow,
    // filter-pruned scan, measured cheaper than shipping+sorting |R|
    // replicas at sf10 (2.8 s → see BASELINE.md).
    //
    // Equivalence: any left row t' in bucket b+1 satisfies t' >= start(b+1)
    // > ts of every bucket-b right row, so the replicated set's running
    // last at t' is exactly the bucket's max by (TS, tieBreak) — the
    // boundary row. max_by's struct comparison is lexicographic with null
    // fields smallest, matching the window's `tieBreak asc_nulls_first`;
    // cross-boundary TS ties are impossible (different buckets), so the
    // side tag never has to break one.
    val rTagged =
      if (bucketMillis.isDefined) {
        val ord = tieBreak match {
          case Some(t) => struct(col(TS), col(R).getField(t))
          case None    => struct(col(TS))
        }
        val boundary = rBase
          .groupBy(col(K), col(BKT))
          .agg(max_by(col(R), ord).as(R), max(col(TS)).as(TS))
          .select(
            lit(null).cast(lStruct).as(L), col(K), (col(BKT) + 1).as(BKT),
            col(TS), lit(if (strict) 2 else 0).as(SIDE), col(R))
        rBase.unionByName(boundary)
      } else rBase

    val partKeys = col(K) +: (if (bucketMillis.isDefined) Seq(col(BKT)) else Nil)
    // tie-break: right rows sharing (key, ts) order ascending by the named
    // payload field, so the running `last` keeps the greatest — the dedup the
    // caller would otherwise pay a groupBy shuffle for. Left rows carry a
    // null R and can never tie with a right row at the same (ts, side)
    // because the side tags differ; nulls_first keeps any null tie-break
    // values from shadowing real ones.
    val ordering = Seq(col(TS).asc, col(SIDE).asc) ++
      tieBreak.map(t => col(R).getField(t).asc_nulls_first)
    val w = Window.partitionBy(partKeys: _*).orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lTagged.unionByName(rTagged)
      .withColumn(M, last(col(R), ignoreNulls = true).over(w))
      .filter(col(SIDE) === 1)

    val freshEnough = toleranceMillis match {
      case Some(tol) =>
        // unix_micros is exact on the timestamp range (no double rounding)
        when(unix_micros(col(TS)) - unix_micros(col(M).getField(rightTs)) <= tol * 1000L, col(M))
      case None => col(M)
    }
    matched
      .withColumn(M, freshEnough)
      .select(leftCols.map(c => col(s"$L.`$c`").as(c)) ++
              payload.map(p => col(s"$M.`$p`").as(p)): _*)
  }
}
