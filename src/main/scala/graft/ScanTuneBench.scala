package graft

/** Reader-knob A/B over the q_agg_pricing 5-column lineitem scan (the sf100
  * scan floor AggScanBench attributes 63% of the query to). Both knobs are
  * runtime SQLConf, so one session serves all variants:
  *
  *   - columnarReaderBatchSize: rows per vectorized batch (default 4096);
  *     bigger batches amortize per-batch dispatch on wide scans.
  *   - columnVector.offheap.enabled: column vectors outside the JVM heap
  *     (no GC pressure from scan buffers).
  *
  * Run: SPARK_GRAFT_SF_DIR=... `runMain graft.ScanTuneBench [samples]`.
  */
object ScanTuneBench {
  def main(args: Array[String]): Unit = {
    val samples = if (args.nonEmpty) args(0).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata/sf100")
    val spark = Tables.harnessSessionFor(sfDir)
    def scan5 = Tables.load(spark, sfDir, "lineitem")
      .select("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount")

    val variants: Seq[(String, Map[String, String])] = Seq(
      "default(4096,heap)" -> Map(),
      "batch16k" -> Map("spark.sql.parquet.columnarReaderBatchSize" -> "16384"),
      "offheap" -> Map("spark.sql.columnVector.offheap.enabled" -> "true"),
      "batch16k+offheap" -> Map(
        "spark.sql.parquet.columnarReaderBatchSize" -> "16384",
        "spark.sql.columnVector.offheap.enabled" -> "true")
    )
    val baseline = variants.flatMap(_._2.keys).distinct
      .map(k => k -> spark.conf.get(k)).toMap

    scan5.write.format("noop").mode("overwrite").save() // warm
    val times = scala.collection.mutable.Map(variants.map(_._1 -> Vector.empty[Double]): _*)
    for (i <- 1 to samples; (label, conf) <- variants) {
      baseline.foreach { case (k, v) => spark.conf.set(k, v) }
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      val t0 = System.nanoTime()
      scan5.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      times(label) :+= dt
      println(f"$label sample $i: $dt%.3f s")
    }
    def median(v: Vector[Double]) = v.sorted.apply(v.size / 2)
    println("MEDIANS " + variants.map { case (l, _) =>
      f"$l=${median(times(l))}%.3f" }.mkString(" "))
    spark.stop()
  }
}
