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

  test("checked-in DocumentsRecord matches what TypeGen emits today") {
    // The generated artifact is source-controlled (like the reference's
    // generated .d.ts); this pin fails if the table schema drifts without
    // regenerating. Whitespace-insensitive so formatting nits don't bite.
    val docs = graft.SparkTestSession.spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val emitted = TypeGen.caseClass("DocumentsRecord", docs.schema)
      .replaceAll("\\s+", " ").trim
    val checkedIn = java.nio.file.Files.readString(java.nio.file.Paths.get(
      "src/main/scala/graft/sources/generated/DocumentsRecord.scala"))
    val body = checkedIn.substring(checkedIn.indexOf("final case class"))
      .replaceAll("\\s+", " ").trim
    assert(body == emitted)
  }

  test("typed Dataset[DocumentsRecord] consumption: filter + map through typed fields") {
    // The point of TypeGen: compile-time field access. A typo'd field or
    // wrong type here is a compile error, not a runtime AnalysisException.
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    import graft.sources.generated.DocumentsRecord
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .as[DocumentsRecord]
    val enDocs = docs.filter(_.lang.contains("en"))
    val lens: Seq[(Long, Long)] = enDocs
      .map(d => (d.doc_id.getOrElse(-1L), d.n_chars.getOrElse(0L)))
      .collect().toSeq
    assert(lens.nonEmpty)
    assert(lens.forall(_._1 >= 0))
    // typed pipeline agrees with the untyped column form on the same data
    val untypedCount = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(org.apache.spark.sql.functions.col("lang") === "en").count()
    assert(lens.size.toLong == untypedCount)
    // typed aggregation composes with the functional API
    val totalChars = enDocs.map(_.n_chars.getOrElse(0L)).reduce(_ + _)
    assert(totalChars == lens.map(_._2).sum)
  }
}
