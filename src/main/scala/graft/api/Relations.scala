package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Relation kinds, mirroring the reference's relation model
  * (reference: src/QueryBuilder.ts:330-485, src/utils/relationResolver.ts:63-147).
  *
  *  - hasOne / hasMany:      `localKey` values match the foreign source's `foreignKey`.
  *  - belongsTo / belongsToMany: inverse lookup via the same key semantics.
  *  - hasOneThrough / hasManyThrough: two-hop join via an intermediate source.
  *
  * Any key may be a nested dot-path and/or array-valued (e.g. the reference's
  * `combinedHerbs.slug`): keys resolve through [[FieldPath]] exactly like the
  * reference's `resolveField`, and every value of a multi-valued key
  * participates in the match (reference: buildForeignKeyMap,
  * src/utils/relationResolver.ts:20-40).
  */
sealed trait Relation { def name: String; def to: String }
sealed trait DirectRelation extends Relation { def localKey: String; def foreignKey: String }
final case class HasOne(name: String, to: String, localKey: String, foreignKey: String) extends DirectRelation
final case class HasMany(name: String, to: String, localKey: String, foreignKey: String) extends DirectRelation
final case class BelongsTo(name: String, to: String, localKey: String, foreignKey: String) extends DirectRelation
final case class BelongsToMany(name: String, to: String, localKey: String, foreignKey: String) extends DirectRelation
sealed trait ThroughRelation extends Relation {
  def through: String
  def sourceLocalKey: String
  def throughForeignKey: String
  def throughLocalKey: String
  def targetForeignKey: String
}
final case class HasOneThrough(name: String, to: String, through: String,
    sourceLocalKey: String, throughForeignKey: String,
    throughLocalKey: String, targetForeignKey: String) extends ThroughRelation
final case class HasManyThrough(name: String, to: String, through: String,
    sourceLocalKey: String, throughForeignKey: String,
    throughLocalKey: String, targetForeignKey: String) extends ThroughRelation

/** Relation resolution as DataFrame transforms.
  *
  * The reference resolves relations by loading foreign rows into driver memory
  * and probing hash maps per row (src/utils/relationResolver.ts:63-147). The
  * Spark-native equivalent is a join: broadcast when the foreign side is a
  * small dimension, shuffle otherwise — Catalyst/AQE pick the physical
  * strategy, and at 100 TB the fact side never moves through the driver.
  */
object Relations {

  private def maybeBroadcast(df: DataFrame, hint: Boolean): DataFrame =
    if (hint) broadcast(df) else df

  /** Key columns normalized to string so heterogeneous key types (the reference
    * compares stringified values) join consistently.
    */
  private def k(c: Column): Column = c.cast(StringType)

  private def isScalarKey(df: DataFrame, path: String): Boolean =
    FieldPath.isSimpleColumn(df, path)

  /** df + one row per key value in column `as` (scalar keys stay one row). */
  private def withKey(df: DataFrame, path: String, as: String, outer: Boolean): DataFrame =
    if (isScalarKey(df, path)) df.withColumn(as, k(col(path)))
    else if (outer) df.withColumn(as, explode_outer(FieldPath.resolve(df, path)))
    else df.withColumn(as, explode(FieldPath.resolve(df, path)))

  // ---- flat (SQL-shaped) joins -------------------------------------------

  /** Flat join: base columns + foreign columns, one output row per match.
    * `*Many` relations naturally multiply rows. The shape analytics queries
    * and the DuckDB oracle consume.
    */
  def flatJoin(
      base: DataFrame,
      foreign: DataFrame,
      localKey: String,
      foreignKey: String,
      broadcastForeign: Boolean = false,
      joinType: String = "inner"
  ): DataFrame = {
    val f = maybeBroadcast(foreign, broadcastForeign)
    base.join(f, k(base(localKey)) === k(f(foreignKey)), joinType)
  }

  /** Flat two-hop join for through-relations. */
  def flatThroughJoin(
      base: DataFrame,
      through: DataFrame,
      target: DataFrame,
      rel: ThroughRelation,
      broadcastThrough: Boolean = false,
      broadcastTarget: Boolean = false
  ): DataFrame = {
    val t  = maybeBroadcast(through, broadcastThrough)
    val tg = maybeBroadcast(target, broadcastTarget)
    base
      .join(t, k(base(rel.sourceLocalKey)) === k(t(rel.throughForeignKey)))
      .join(tg, k(t(rel.throughLocalKey)) === k(tg(rel.targetForeignKey)))
  }

  // ---- nested (API-faithful) resolution ----------------------------------

  /** Foreign rows aggregated per key value: (__graft_fk, <name>: array<struct>).
    * A foreign row appears once under EACH of its key values — exactly the
    * reference's buildForeignKeyMap.
    */
  private def keyedForeign(foreign: DataFrame, foreignKey: String, name: String): DataFrame =
    withKey(foreign, foreignKey, "__graft_fk", outer = false)
      .groupBy(col("__graft_fk"))
      .agg(sort_array(collect_list(struct(foreign.columns.map(col).toIndexedSeq: _*))).as(name))

  /** Attach `keyed` (__graft_fk → array) to every base row by `localKey`.
    * Scalar local keys use one equi-join; multi-valued keys explode, join and
    * regroup by all base columns (flatten + distinct, like the reference's
    * flat-and-dedup of per-key matches).
    */
  private def attach(base: DataFrame, keyed: DataFrame, localKey: String,
                     name: String, single: Boolean, broadcastForeign: Boolean): DataFrame = {
    val keyedB = maybeBroadcast(keyed, broadcastForeign)
    val joined =
      if (isScalarKey(base, localKey)) {
        base.join(keyedB, k(base(localKey)) === keyedB("__graft_fk"), "left")
          .drop("__graft_fk")
      } else {
        // Regroup by a synthetic row id, not by the base columns: grouping by
        // value would silently collapse duplicate base rows (and fail on
        // ungroupable types like maps).
        val baseCols = base.columns.toIndexedSeq
        val withId = base.withColumn("__graft_rid", monotonically_increasing_id())
        val aggs = baseCols.map(c => first(col(c)).as(c)) :+
          array_distinct(flatten(collect_list(col(name)))).as(name)
        withKey(withId, localKey, "__graft_lk", outer = true)
          .join(keyedB, col("__graft_lk") === keyedB("__graft_fk"), "left")
          .drop("__graft_fk")
          .groupBy(col("__graft_rid"))
          .agg(aggs.head, aggs.tail: _*)
          .drop("__graft_rid")
      }
    // get() (0-based) is ANSI-safe on empty arrays, unlike element_at.
    if (single) joined.withColumn(name, get(sort_array(coalesce(col(name), array())), lit(0)))
    else joined.withColumn(name, coalesce(col(name), array()))
  }

  /** Attaches a column named `rel.name` holding the related record(s) — a
    * struct for `hasOne*` (null when unmatched), an array of structs otherwise
    * — like the reference embeds related records in each row
    * (src/QueryBuilder.ts:390-414). One aggregation of the foreign side + one
    * equi-join; no driver round-trips.
    */
  def nested(
      base: DataFrame,
      rel: Relation,
      foreign: DataFrame,
      through: Option[DataFrame] = None,
      broadcastForeign: Boolean = false
  ): DataFrame = rel match {
    case r: DirectRelation =>
      val single = r.isInstanceOf[HasOne]
      attach(base, keyedForeign(foreign, r.foreignKey, r.name), r.localKey, r.name,
        single, broadcastForeign)
    case r: ThroughRelation =>
      val thr = through.getOrElse(
        throw new IllegalArgumentException(s"Through relation ${r.name} needs the intermediate DataFrame"))
      val single = r.isInstanceOf[HasOneThrough]
      // bridge: one row per (sourceKey value, targetKey value) of the through
      // source — nested/array keys fan out like the reference's resolveField.
      val bridge = withKey(withKey(thr, r.throughForeignKey, "__graft_src", outer = false),
        r.throughLocalKey, "__graft_tgt", outer = false)
        .select(col("__graft_src"), col("__graft_tgt"))
      val targetKeyed = keyedForeign(foreign, r.targetForeignKey, r.name)
      // Path dedup happens on the NARROW (src, tgt) key pairs, BEFORE target
      // rows attach. DELIBERATE DIVERGENCE from the reference: its
      // resolveThroughRelation (relationResolver.ts) emits the target once
      // PER through record, so a through table mapping the same (src, tgt)
      // pair twice nests the target twice; we dedup by path pair, nesting it
      // once. Set semantics are what the flat-join oracle twin (and any SQL
      // user) expects, and they keep the exchange narrow; duplicate-preserving
      // flatten would also force a per-through-row join fan-out upstream. (The
      // pre-round-8 array_distinct shape diverged the same way, so this is a
      // documented long-standing choice, not a regression.) The previous shape
      // deduped AFTER the fact with array_distinct
      // over the flattened struct arrays, which (a) is O(n²) for non-atomic
      // element types — a 30k-customer fan-out took 47 s at sf1 on struct
      // pairwise compares — and (b) collapses genuinely distinct target rows
      // that happen to be value-identical, which the flat-join oracle twin
      // counts separately.
      val keyed = bridge.distinct()
        .join(targetKeyed, col("__graft_tgt") === targetKeyed("__graft_fk"))
        .groupBy(col("__graft_src").as("__graft_fk2"))
        .agg(flatten(collect_list(col(r.name))).as(r.name))
        .withColumnRenamed("__graft_fk2", "__graft_fk")
      attach(base, keyed, r.sourceLocalKey, r.name, single, broadcastForeign)
  }
}
