package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim

/** Sequence packing: assign documents to fixed-token-capacity bins ("packs")
  * for training-batch assembly.
  *
  * The distributed contract is SHARD-LOCAL streaming packing: documents hash
  * into `shards` independent lanes, and within a lane each doc is placed at
  * the running token offset, its pack being `start_offset div capacity`.
  * Globally-optimal bin packing is NP-hard and inherently sequential; the
  * lane prefix-sum is one window over one shuffle, scales by adding lanes,
  * and its waste is bounded (≤ one doc tail per capacity boundary — the
  * standard approximation every large training pipeline uses).
  *
  * Deterministic and engine-portable: pack ids are a pure function of
  * `(id, token count)` — the DuckDB oracle recomputes them with the same
  * window algebra. A doc longer than `capacity` occupies its own pack span
  * (subsequent packs shift past it); callers wanting hard rejection filter
  * on `tokenCol > capacity` first.
  *
  * OVERFILL CONTRACT: a doc is assigned to the pack of its START offset, so
  * a pack's token total can exceed `capacity` by up to the tail of its last
  * doc (capacity 512, docs 300+300 → pack 0 holds 600). This is the bounded
  * waste the scaladoc above prices in; packs are NOT hard-capped bins.
  * Callers feeding fixed-length training batches own truncation/splitting of
  * the boundary doc — [[packUtilization]] flags every such pack
  * (`overfilled`, utilization > 1.0) so nothing is silent.
  *
  * Scale shape: ONE hashpartitioning(shard) exchange feeding a running-sum
  * window; only (id, tokens) width shuffles. Skew-free by construction —
  * lanes are hash-uniform regardless of document-length distribution.
  */
object Packing {

  /** Adds `shard` and `pack_id` to `df`.
    *
    * @param idCol    unique orderable id (lane order = packing order)
    * @param tokenCol per-row token count (precomputed — token source stays
    *                 the caller's choice)
    */
  def packBySequence(df: DataFrame, idCol: String, tokenCol: String,
                     capacity: Long, shards: Int = 8): DataFrame = {
    require(capacity > 0, s"Packing: capacity must be positive, got $capacity")
    require(shards > 0, s"Packing: shards must be positive, got $shards")
    Seq("shard", "pack_id").foreach(c => require(!df.columns.contains(c),
      s"Packing: input already has a '$c' column — rename it before packing"))
    val shard = pmod(col(idCol), lit(shards.toLong)).cast("int")
    val w = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", shard)
      .withColumn("pack_id",
        ColumnShim.intDiv(
          sum(col(tokenCol)).over(w) - col(tokenCol), lit(capacity)))
  }

  /** Per-pack fill report: docs, token total, utilization of `capacity`, and
    * an `overfilled` flag for packs whose boundary doc pushed them past
    * `capacity` (utilization > 1.0 — see the overfill contract above).
    */
  def packUtilization(packed: DataFrame, tokenCol: String, capacity: Long): DataFrame =
    packed.groupBy("shard", "pack_id")
      .agg(count(lit(1)).as("n_docs"),
           sum(col(tokenCol)).as("tokens"),
           round(sum(col(tokenCol)).cast("double") / capacity, 4).as("utilization"),
           (sum(col(tokenCol)) > capacity).as("overfilled"))
}
