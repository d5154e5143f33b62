package graft

import org.apache.spark.sql.functions._

/** The agg scan-constant decomposition (BASELINE.md): where does
  * q_agg_pricing's sf100 time go? Each stage adds one plan component over
  * the same lineitem scan, so consecutive deltas attribute the cost:
  *
  *   1. scan1      — read ONE double column, noop write (reader floor, one col)
  *   2. scan5      — read the query's 5 columns, noop write (reader floor)
  *   3. agg_double — groupBy(2 keys) with plain double sums (agg machinery)
  *   4. agg_dec128 — the registered q_agg_pricing (exact money arithmetic)
  *
  * Interleaved samples, medians printed. Run:
  * SPARK_GRAFT_SF_DIR=... `runMain graft.AggScanBench [samples]`.
  */
object AggScanBench {
  def main(args: Array[String]): Unit = {
    val samples = if (args.nonEmpty) args(0).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata/sf10")
    val spark = Tables.harnessSessionFor(sfDir)
    def li = Tables.load(spark, sfDir, "lineitem")

    val stages: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "scan1" -> (() => li.select("l_extendedprice")),
      "scan5" -> (() => li.select("l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice", "l_discount")),
      "agg_double" -> (() => li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity").as("sum_qty"),
          sum("l_extendedprice").as("sum_base_price"),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),
      "agg_dec128" -> (() => SparkEntry.queries("q_agg_pricing")(spark, sfDir))
    )

    li.write.format("noop").mode("overwrite").save() // warm page cache
    val times = scala.collection.mutable.Map(stages.map(_._1 -> Vector.empty[Double]): _*)
    for (i <- 1 to samples; (label, mk) <- stages) {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      times(label) :+= dt
      println(f"$label sample $i: $dt%.3f s")
    }
    def median(v: Vector[Double]) = v.sorted.apply(v.size / 2)
    println("MEDIANS " + stages.map { case (l, _) =>
      f"$l=${median(times(l))}%.3f" }.mkString(" "))
    spark.stop()
  }
}
