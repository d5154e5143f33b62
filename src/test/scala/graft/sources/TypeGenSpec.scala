package graft.sources

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class TypeGenSpec extends AnyFunSuite {

  test("flat schema renders a case class with Option for nullables") {
    val schema = StructType(Seq(
      StructField("slug", StringType, nullable = false),
      StructField("count", LongType, nullable = true),
      StructField("tags", ArrayType(StringType), nullable = true)))
    val src = TypeGen.caseClass("HerbsRecord", schema)
    assert(src.contains("final case class HerbsRecord("))
    assert(src.contains("slug: String"))
    assert(src.contains("count: Option[Long]"))
    assert(src.contains("tags: Seq[Option[String]]") || src.contains("tags: Seq[String]"))
  }

  test("nested structs get their own classes; odd names are backticked") {
    val schema = StructType(Seq(
      StructField("meta", StructType(Seq(
        StructField("kind", StringType, nullable = false),
        StructField("max-age", IntegerType, nullable = true))), nullable = true)))
    val src = TypeGen.caseClass("Doc", schema)
    assert(src.contains("final case class Nested"))
    assert(src.contains("`max-age`: Option[Int]"))
    // the field references the generated nested class name
    val nestedName = "Nested\\d+".r.findFirstIn(src).get
    assert(src.contains(s"meta: $nestedName"))
  }

  test("generated source round-trips with a real table schema") {
    val docs = graft.SparkTestSession.spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val src = TypeGen.caseClass("DocumentsRecord", docs.schema)
    assert(src.contains("doc_id:"))
    assert(src.contains("text: Option[String]") || src.contains("text: String"))
  }
}
