package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dot-path field resolution over nested structs and arrays-of-structs.
  *
  * Mirrors the reference's `resolveField` (reference: src/utils/field.ts:26-45):
  * a path like `a.b.c` descends through objects and arrays, flattens, drops
  * nulls, and stringifies every leaf — the result is always `array<string>`.
  * Here the descent is pure Catalyst column algebra (`getField` over structs and
  * arrays-of-structs, `flatten` between array levels), so it stays inside
  * whole-stage codegen and never leaves the optimizer's sight.
  */
object FieldPath {

  /** True when `path` is a plain top-level scalar column — the common case where
    * a filter should be a bare pushdown-friendly predicate on `col(path)`.
    */
  def isSimpleColumn(df: DataFrame, path: String): Boolean =
    !path.contains('.') && df.schema.fieldNames.contains(path) && (df.schema(path).dataType match {
      // binary excluded: String.valueOf(Array[Byte]) cursors can never
      // round-trip a keyset predicate — route through stringified resolution
      case _: StructType | _: ArrayType | _: MapType | BinaryType => false
      case _                                                      => true
    })

  /** Resolve `path` to an `array<string>` column of all leaf values (nulls
    * dropped), like the reference's `resolveField`.
    */
  def resolve(df: DataFrame, path: String): Column = {
    val segs = path.split('.')
    require(segs.nonEmpty && segs.forall(_.nonEmpty), s"Bad field path: $path")
    val root = df.schema.fields
      .find(_.name == segs.head)
      .getOrElse(throw new IllegalArgumentException(s"Unknown field: ${segs.head} in $path"))
    var c: Column      = col(segs.head)
    var dt: DataType   = root.dataType
    segs.tail.foreach { seg =>
      // Collapse nested arrays so at most one array level wraps the struct.
      var unnested = dt
      while (unnested.isInstanceOf[ArrayType] &&
             unnested.asInstanceOf[ArrayType].elementType.isInstanceOf[ArrayType]) {
        c = flatten(c)
        unnested = ArrayType(
          unnested.asInstanceOf[ArrayType].elementType.asInstanceOf[ArrayType].elementType)
      }
      unnested match {
        case StructType(fields) =>
          val f = fields.find(_.name == seg)
            .getOrElse(throw new IllegalArgumentException(s"Unknown field: $seg in $path"))
          c = c.getField(seg); dt = f.dataType
        case ArrayType(StructType(fields), _) =>
          val f = fields.find(_.name == seg)
            .getOrElse(throw new IllegalArgumentException(s"Unknown field: $seg in $path"))
          c = c.getField(seg); dt = ArrayType(f.dataType)
        case other =>
          throw new IllegalArgumentException(s"Cannot descend into $other at '$seg' of $path")
      }
    }
    // Flatten any remaining nested arrays, wrap scalars, stringify, drop nulls.
    var out = c
    var odt = dt
    while (odt.isInstanceOf[ArrayType] &&
           odt.asInstanceOf[ArrayType].elementType.isInstanceOf[ArrayType]) {
      out = flatten(out)
      odt = ArrayType(odt.asInstanceOf[ArrayType].elementType.asInstanceOf[ArrayType].elementType)
    }
    val arr = odt match {
      case _: ArrayType => out
      case _            => array(out)
    }
    filter(arr.cast(ArrayType(StringType)), x => x.isNotNull)
  }

  /** Predicate: any leaf value under `path` satisfies `pred`. For simple scalar
    * columns this degrades to a bare predicate on the column itself so Catalyst
    * can push it into the scan.
    */
  def anyLeaf(df: DataFrame, path: String, pred: Column => Column): Column =
    if (isSimpleColumn(df, path)) pred(col(path).cast(StringType))
    else exists(resolve(df, path), pred)
}
