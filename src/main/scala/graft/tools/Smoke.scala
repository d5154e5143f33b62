package graft.tools
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.harnessSessionFor("/root/testdata/sf0.001")
    val rows = graft.SparkEntry.entry(spark).collect()
    println(s"[smoke] entry rows = ${rows.length}")
    assert(rows.nonEmpty)
    spark.stop()
  }
}
