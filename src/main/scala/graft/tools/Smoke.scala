package graft.tools

/** Driver t1 equivalent: SparkEntry.entry on sf0.001 must return rows. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.harnessSession()
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows = $n")
    require(n > 0, "flagship entry returned no rows")
    spark.stop()
  }
}
