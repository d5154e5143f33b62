package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

class LayoutSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  /** Rows the parquet reader actually emitted for this query (post
    * row-group min/max skipping, pre any later filter).
    */
  private def scanOutputRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    collectWithSubqueries(df.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s.metrics("numOutputRows").value
    }.sum
  }

  test("range-sorted layout prunes row groups the filter cannot match") {
    val n = 200000L
    val rnd = new scala.util.Random(5)
    // shuffled key order: every row group of a naive write spans ~the full
    // key range, so nothing can min/max-skip
    val data = rnd.shuffle((0L until n).toVector).toDF("k")
      .withColumn("payload", concat(lit("row "), col("k")))
    val base = java.nio.file.Files.createTempDirectory("graft_layout_spec").toString
    data.write.mode("overwrite").option("parquet.block.size", "65536").parquet(s"$base/naive")
    Layout.writeSorted(data, s"$base/sorted", Seq("k"), rowGroupBytes = Some(65536L))

    // one execution per layout: scanOutputRows collects, so row count and
    // scan metric come from the same run
    def readCount(path: String): (Long, Long) = {
      val q = spark.read.parquet(path).filter(col("k") >= 1000 && col("k") < 2000)
      val scanned = scanOutputRows(q)
      (q.count(), scanned)
    }
    val (naiveRows, naiveScanned) = readCount(s"$base/naive")
    val (sortedRows, sortedScanned) = readCount(s"$base/sorted")
    assert(naiveRows == 1000 && sortedRows == 1000) // same answer either way
    // The sorted layout's scan emits a small fraction of the naive one's:
    // row groups outside [1000, 2000) min/max-miss and never reach the reader.
    assert(sortedScanned < naiveScanned / 10,
      s"sorted layout scanned $sortedScanned rows vs naive $naiveScanned — pruning not engaged")
    assert(sortedScanned >= 1000)
  }

  test("guards: missing sort column") {
    val df = Seq((1L, "x")).toDF("k", "v")
    val dir = java.nio.file.Files.createTempDirectory("graft_layout_guard").toString
    intercept[IllegalArgumentException] {
      Layout.writeSorted(df, s"$dir/a", Seq("nope"))
    }
    intercept[IllegalArgumentException] {
      Layout.writeSorted(df, s"$dir/b", Seq())
    }
  }
}
