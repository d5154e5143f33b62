package graft.sources

import org.apache.spark.sql.types._

/** Scala case-class source generation from DataFrame schemas — the typed-API
  * equivalent of the reference's `staticql-gen-types` CLI
  * (reference: cli/generate-types.ts: JSON-schema → TypeScript types). Feed
  * the generated classes to `spark.createDataset`/`as[T]` for a compile-time
  * contract over a source.
  */
object TypeGen {

  private def scalaType(dt: DataType, nullable: Boolean): String = {
    val base = dt match {
      case ByteType | ShortType | IntegerType => "Int"
      case LongType                           => "Long"
      case FloatType                          => "Float"
      case DoubleType                         => "Double"
      case BooleanType                        => "Boolean"
      case StringType                         => "String"
      case BinaryType                         => "Array[Byte]"
      case _: DecimalType                     => "BigDecimal"
      case DateType                           => "java.sql.Date"
      case TimestampType                      => "java.sql.Timestamp"
      case ArrayType(et, containsNull)        => s"Seq[${scalaType(et, containsNull)}]"
      case MapType(kt, vt, valueContainsNull) =>
        s"Map[${scalaType(kt, nullable = false)}, ${scalaType(vt, valueContainsNull)}]"
      case s: StructType                      => structName(s)
      case other                              => s"String /* unsupported: ${other.simpleString} */"
    }
    dt match {
      case _: StructType | _: ArrayType | _: MapType => base // wrappers stay bare
      case _ => if (nullable && !base.startsWith("Array[")) s"Option[$base]" else base
    }
  }

  private def structName(s: StructType): String =
    "Nested" + math.abs(s.simpleString.hashCode).toString

  private def fieldName(raw: String): String =
    if (raw.matches("[A-Za-z_][A-Za-z0-9_]*")) raw else s"`$raw`"

  /** Generate the case class (plus any nested struct classes) for a schema. */
  def caseClass(name: String, schema: StructType): String = {
    val nested = scala.collection.mutable.LinkedHashMap.empty[String, StructType]
    def collect(dt: DataType): Unit = dt match {
      case s: StructType => nested.getOrElseUpdate(structName(s), s); s.fields.foreach(f => collect(f.dataType))
      case ArrayType(et, _) => collect(et)
      case MapType(kt, vt, _) => collect(kt); collect(vt)
      case _ =>
    }
    schema.fields.foreach(f => collect(f.dataType))
    def render(clsName: String, s: StructType): String = {
      val fields = s.fields.map(f => s"    ${fieldName(f.name)}: ${scalaType(f.dataType, f.nullable)}")
      s"final case class $clsName(\n${fields.mkString(",\n")}\n)"
    }
    (nested.toSeq.map { case (n, s) => render(n, s) } :+ render(name, schema)).mkString("\n\n")
  }
}
