package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Relation kinds, mirroring the reference's relation model
  * (reference: src/QueryBuilder.ts:330-485, src/utils/relationResolver.ts:63-147).
  *
  *  - hasOne / hasMany:      `localKey` values match the foreign source's `foreignKey`.
  *  - belongsTo / belongsToMany: inverse lookup; `localKey` may be array-valued
  *    (belongsToMany joins through the exploded key set).
  *  - hasOneThrough / hasManyThrough: two-hop join via an intermediate source.
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

  /** Flat (SQL-shaped) join: base columns + selected foreign columns, one output
    * row per match. `*Many` relations naturally multiply rows. This is the
    * shape analytics queries and the DuckDB oracle consume.
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

  /** API-faithful nested resolution: attaches a column named `rel.name` holding
    * the related record(s) — a struct for `hasOne*`, an array of structs for the
    * `*Many` kinds — exactly like the reference embeds related records in each
    * row (src/QueryBuilder.ts:390-414).
    *
    * Plan shape: aggregate the foreign side once by its key (map-side partial
    * aggregation), then a single equi-join against the base. The foreign
    * aggregate is broadcast when hinted. Related arrays are sorted for
    * determinism (the reference's "first match" is file-enumeration order;
    * struct-sort order is our documented equivalent).
    */
  def nested(
      base: DataFrame,
      rel: Relation,
      foreign: DataFrame,
      through: Option[DataFrame] = None,
      broadcastForeign: Boolean = false
  ): DataFrame = rel match {
    case r: DirectRelation =>
      val fkCol = "__graft_fk"
      val agg = foreign
        .groupBy(k(col(r.foreignKey)).as(fkCol))
        .agg(sort_array(collect_list(struct(foreign.columns.map(col).toIndexedSeq: _*))).as(r.name))
      val aggB = maybeBroadcast(agg, broadcastForeign)
      r match {
        case _: BelongsToMany =>
          // Array-valued local key: explode, join per key value, regroup by the
          // base's unique key set (all base columns), de-duplicate matches.
          val lkCol   = "__graft_lk"
          val baseCols = base.columns.toIndexedSeq
          val exploded = base.select(col("*"), explode_outer(col(r.localKey)).as(lkCol))
          val joined = exploded
            .join(aggB, k(col(lkCol)) === col(fkCol), "left")
            .drop(fkCol)
          joined
            .groupBy(baseCols.map(col): _*)
            .agg(array_distinct(flatten(collect_list(col(r.name)))).as(r.name))
        case _ =>
          val joined = base
            .join(aggB, k(base(r.localKey)) === aggB(fkCol), "left")
            .drop(fkCol)
          r match {
            case _: HasOne => joined.withColumn(r.name, element_at(col(r.name), 1))
            case _         => joined.withColumn(r.name, coalesce(col(r.name), array()))
          }
      }
    case r: ThroughRelation =>
      val thr = through.getOrElse(
        throw new IllegalArgumentException(s"Through relation ${r.name} needs the intermediate DataFrame"))
      val srcCol = "__graft_src"
      // bridge: (sourceKey -> target record) pairs, then aggregate per sourceKey.
      val bridge = thr
        .select(k(col(r.throughForeignKey)).as(srcCol), k(col(r.throughLocalKey)).as("__graft_tgt"))
        .join(foreign, col("__graft_tgt") === k(foreign(r.targetForeignKey)))
        .groupBy(col(srcCol))
        .agg(sort_array(collect_list(struct(foreign.columns.map(col).toIndexedSeq: _*))).as(r.name))
      val bridgeB = maybeBroadcast(bridge, broadcastForeign)
      val joined = base
        .join(bridgeB, k(base(r.sourceLocalKey)) === bridgeB(srcCol), "left")
        .drop(srcCol)
      r match {
        case _: HasOneThrough => joined.withColumn(r.name, element_at(col(r.name), 1))
        case _                => joined.withColumn(r.name, coalesce(col(r.name), array()))
      }
  }
}
