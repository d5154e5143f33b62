package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (one JVM-wide session, lazy). */
object SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // mirror the harness session (Tables.build): consume bucket-sort
    // metadata — Spark still verifies bucketsContainSingleFile per scan
    .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    .getOrCreate()
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkTestSession.spark
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Drop catalog tables AND their managed warehouse directories — a test
    * failure between create and drop leaves the location behind while the
    * in-memory catalog forgets it, and the next run's CREATE then trips
    * over stale files. Shared by every bucketed-table spec.
    */
  protected def dropTables(names: String*): Unit =
    names.foreach { n =>
      spark.sql(s"DROP TABLE IF EXISTS $n")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), n)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
        }
        rm(loc)
      }
    }
}
