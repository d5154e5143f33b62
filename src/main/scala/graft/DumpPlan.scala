package graft
object DumpPlan {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Tables.harnessSessionFor(dir)
    args.foreach { q =>
      println(s"===== $q =====")
      val df = SparkEntry.queries(q)(spark, dir)
      println(df.queryExecution.optimizedPlan.treeString)
    }
    spark.stop()
  }
}
