package graft

/** Single-query bench loop for plan iteration: `runMain graft.BenchOne
  * <query> [samples]` against SPARK_GRAFT_SF_DIR. Prints every sample (not
  * just the median) so warmup effects and variance stay visible while a
  * plan is being tuned; Bench remains the reporting harness.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BenchOne <queryName> [samples]")
    val name = args(0)
    val samples = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.harnessSessionFor(sfDir)
    require(SparkEntry.queries.contains(name),
      s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    for (i <- 1 to samples) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"$name sample $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
