package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Schema validation, two layers:
  *
  *  1. [[validateRecord]] — recursive AST validation mirroring the reference's
  *     `simpleValidate` (reference: src/validator/simpleValidate.ts:10-120):
  *     types string/number/integer/boolean/date/null/array/object, `required`,
  *     `properties`, `items`. Used at ingest time on parsed records.
  *  2. [[validColumn]] — the same rule set compiled to a Catalyst predicate
  *     for already-structured DataFrames, so corpus-wide validation is a scan,
  *     not a collect.
  */
object Validation {

  /** Throws IllegalArgumentException on the first violation (message format
    * mirrors the reference).
    */
  def validateRecord(data: Any, schema: Map[String, Any], path: String = "value"): Unit = {
    val expected = schema.get("type") match {
      case Some(s: String)  => Seq(s)
      case Some(l: Seq[_])  => l.map(String.valueOf(_))
      case _                => return
    }

    data match {
      case null =>
        if (!expected.contains("null"))
          fail(s"Expected ${expected.mkString(" or ")} at '$path', got null")
      case l: Seq[_] if expected.contains("array") =>
        schema.get("items").foreach { items =>
          l.zipWithIndex.foreach { case (item, i) =>
            validateRecord(item, items.asInstanceOf[Map[String, Any]], s"$path[$i]")
          }
        }
      case _: Seq[_] =>
        fail(s"Expected ${expected.mkString(" or ")} at '$path', got array")
      case m: Map[_, _] if expected.contains("object") =>
        val mm = m.asInstanceOf[Map[String, Any]]
        schema.get("required").collect { case req: Seq[_] =>
          req.foreach { k =>
            if (!mm.contains(String.valueOf(k))) fail(s"Missing required field: '$path.$k'")
          }
        }
        schema.get("properties").collect { case props: Map[_, _] =>
          props.asInstanceOf[Map[String, Any]].foreach { case (k, sub) =>
            mm.get(k).foreach(v => validateRecord(v, sub.asInstanceOf[Map[String, Any]], s"$path.$k"))
          }
        }
      case _: Map[_, _] =>
        fail(s"Expected ${expected.mkString(" or ")} at '$path', got object")
      case other =>
        val ok = expected.exists {
          case "string"  => other.isInstanceOf[String]
          case "number"  => other.isInstanceOf[Long] || other.isInstanceOf[Double] || other.isInstanceOf[Int]
          case "integer" => other.isInstanceOf[Long] || other.isInstanceOf[Int] ||
            (other match { case d: Double => d == d.floor; case _ => false })
          case "boolean" => other.isInstanceOf[Boolean]
          case "date" =>
            other.isInstanceOf[String] &&
              scala.util.Try(java.time.LocalDate.parse(String.valueOf(other).take(10))).isSuccess
          case "object" | "array" | "null" => false
          case _ => false
        }
        if (!ok)
          fail(s"Expected ${expected.mkString(" or ")} at '$path', got ${other.getClass.getSimpleName}")
    }
  }

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  /** Compile flat-field rules into one boolean Column. Rules per field:
    * required (non-null), and optional min for numerics. Static type conformance
    * is already guaranteed by the DataFrame schema; this checks the runtime
    * constraints.
    */
  def validColumn(
      df: DataFrame,
      required: Seq[String],
      nonNegative: Seq[String] = Seq.empty
  ): Column = {
    val reqOk = required.map(f => col(f).isNotNull)
    val numOk = nonNegative.map(f => col(f).isNotNull && col(f) >= 0)
    (reqOk ++ numOk).reduceOption(_ && _).getOrElse(lit(true))
  }
}
