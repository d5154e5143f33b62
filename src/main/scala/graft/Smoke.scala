package graft

import org.apache.spark.sql.SparkSession

/** Driver t1 mimic: `SparkEntry.entry` must return rows > 0 on sf0.001.
  * Run: `sbt "runMain graft.Smoke"`. Exits non-zero on an empty result so it
  * can gate commits the way the driver gates rounds.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-smoke")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val n = SparkEntry.entry(spark).count()
      println(s"[smoke] entry rows=$n")
      if (n <= 0) sys.error("entry returned no rows")
    } finally spark.stop()
  }
}
