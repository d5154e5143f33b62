package graft

import java.nio.file.{Files, Path, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 blast-radius contract: one unreadable table must cost only the
  * queries that touch it — never the catalog, never the whole round.
  * (Round 10 lost 32 queries and the entire bench to ONE events schema
  * change because catalog construction and bench warmup were
  * all-or-nothing.)
  */
class HarnessIsolationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** A copy of sf0.001 with one table replaced by a corrupt file. */
  private def corruptedDir(table: String): String = {
    val src = Path.of("/root/testdata/sf0.001")
    val dst = Files.createTempDirectory("graft-corrupt")
    Tables.names.foreach { t =>
      Files.copy(src.resolve(s"$t.parquet"), dst.resolve(s"$t.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    Files.writeString(dst.resolve(s"$table.parquet"), "this is not parquet")
    dst.toString
  }

  test("a corrupt table drops only its own source; every other source still queries") {
    val dir = corruptedDir("events")
    val cat = Tables.catalog(spark, dir)
    // events gone, loudly
    val e = intercept[IllegalArgumentException](cat("events"))
    assert(e.getMessage.contains("Source not found"))
    // the other nine sources are intact and queryable end-to-end
    assert(cat.from("orders").where("o_orderstatus", api.Eq, "F").execDf().count() > 0)
    assert(cat.from("customer").join("nation").execDf().count() > 0)
    assert(cat.from("documents").execDf().count() > 0)
  }

  test("a corrupt DIMENSION still leaves fact-only queries working") {
    val dir = corruptedDir("nation")
    val cat = Tables.catalog(spark, dir)
    intercept[IllegalArgumentException](cat("nation"))
    assert(cat.from("orders").execDf().count() > 0)
    // a join THROUGH the missing table fails loudly, not silently-empty
    intercept[IllegalArgumentException](cat.from("customer").join("nation").execDf())
  }

  test("events ts normalization handles both parquet vintages") {
    import org.apache.spark.sql.types._
    // micros vintage (the current testdata): TimestampNTZ in, Timestamp out
    val micros = Tables.load(spark, "/root/testdata/sf0.001", "events")
    assert(micros.schema("ts").dataType == TimestampType)
    // nanos-as-long vintage: synthesized long column through the same branch
    val longDf = spark.range(3).select(
      (col("id") * 1000000000L + 1700000000000000000L).as("ts"))
    val normed = Tables.normalizeEventsTs(longDf)
    assert(normed.schema("ts").dataType == TimestampType)
    // div-1000 exactness: 1 ns below a microsecond boundary floors DOWN
    val edge = spark.range(2).select(
      when(col("id") === 0, 1700000000000000999L)
        .otherwise(1700000000000001000L).as("ts"))
    val got = Tables.normalizeEventsTs(edge)
      .select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq.sorted
    assert(got == Seq(1700000000000000L, 1700000000000001L))
  }
}
