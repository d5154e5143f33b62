package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded time-range join: all (left, right) pairs with equal keys where the
  * right timestamp falls in `(leftTs - lookback, leftTs]` — "every view in
  * the hour before each purchase", "every log line in a deploy's window".
  * Complements [[AsOf]] (which keeps only the LATEST such row).
  *
  * Plan shape (the 100 TB-safe one): the lookback bound makes the join
  * BANDABLE — bucket both sides by `floor(ts / lookback)`, replicate each
  * right row into its own and the following bucket, equi-join on
  * `(key, bucket)`, then apply the exact range predicate. Candidates are
  * only same-bucket-neighborhood rows, so work is proportional to true
  * matches (plus bucket-collision slack ≤ 2× right), never |L|·|R|. An
  * unconstrained inequality join plans as a broadcast-nested-loop / sorted
  * range join over every same-key pair — the spec keeps that as the
  * tiny-data oracle only.
  *
  * Each (left, right) pair appears at most once: a right row's two replicas
  * carry distinct bucket values and a left row joins exactly its own bucket.
  *
  * Bounds are `lower-exclusive, upper-inclusive` — `rightTs == leftTs`
  * matches, `rightTs == leftTs - lookback` does not — matching the natural
  * "within the last X" reading and DuckDB's
  * `r.ts > l.ts - INTERVAL X AND r.ts <= l.ts`.
  */
object RangeJoin {

  private val K = "__graft_range_k"
  private val BKT = "__graft_range_bkt"

  /** Inner-join pairs; left columns pass through, `payload` names the right
    * columns carried (must not collide with left names).
    */
  def bounded(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      lookbackMillis: Long,
      payload: Seq[String]): DataFrame = {
    require(lookbackMillis > 0, "RangeJoin.bounded: lookback must be positive")
    require(payload.nonEmpty, "RangeJoin.bounded: payload must name at least one right column")
    val leftCols = left.columns.toSeq
    // rightTs joins the output frame too (the range predicate reads it
    // post-join), so it must be collision-free like the payload
    val clash = (payload.toSet + rightTs).intersect(leftCols.toSet)
    require(clash.isEmpty, s"RangeJoin.bounded: right columns collide with left columns: ${clash.mkString(", ")}")
    require(
      left.schema(leftTs).dataType == right.schema(rightTs).dataType,
      s"RangeJoin.bounded: timestamp types differ: ${left.schema(leftTs).dataType} vs ${right.schema(rightTs).dataType}")

    // Integer `div` on micros: exact at every magnitude (double `/` is exact
    // only below 2^53). Truncation toward zero makes bucket 0 span (-B, B)
    // for pre-1970 data — harmless: the band join only needs consistent
    // bucketing + next-bucket replication adjacency, which a double-width
    // bucket preserves, and the exact range predicate filters afterwards.
    def bucketOf(ts: org.apache.spark.sql.Column) =
      org.apache.spark.sql.graftshim.ColumnShim.intDiv(
        unix_micros(ts), lit(lookbackMillis * 1000L))

    val l = left
      .withColumn(K, col(leftKey))
      .withColumn(BKT, bucketOf(col(leftTs)))
    val rBase = right
      .filter(col(rightKey).isNotNull && col(rightTs).isNotNull)
      .select((payload.toSet + rightKey + rightTs).toSeq.map(col): _*)
      .withColumn(K, col(rightKey))
      .withColumn(BKT, bucketOf(col(rightTs)))
    // ONE Generate (explode of [b, b+1]) instead of a self-union: the union
    // evaluates the whole right subtree once per branch (a second scan +
    // filter pass), while explode replicates in a single pass.
    val r = rBase.withColumn(BKT, explode(array(col(BKT), col(BKT) + 1)))
      // the join re-reads only narrow payload columns — drop the rest early
      .select((payload.toSet + rightTs).toSeq.map(col) :+ col(K).as(K + "_r") :+ col(BKT).as(BKT + "_r"): _*)

    val lower = unix_micros(col(leftTs)) - lookbackMillis * 1000L
    // shuffle_hash on the left: a pair-emitting band join gains nothing
    // from sort-merge's ordered streams (the range residual is evaluated
    // per emitted pair either way), and sort-merge would SORT both shuffled
    // sides — measured 2.4 s vs 1.1 s at sf10 on identical output. The
    // left (probe-event) side is the natural build side: band replication
    // doubles the right.
    l.hint("shuffle_hash").join(r,
        col(K) === col(K + "_r") && col(BKT) === col(BKT + "_r") &&
        unix_micros(col(rightTs)) > lower &&
        unix_micros(col(rightTs)) <= unix_micros(col(leftTs)))
      .select(leftCols.map(col) ++ payload.map(col): _*)
  }
}
