package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The layout-level attack on the agg-family scan floor (BASELINE.md "sf100
  * round 18" decomposed q_agg_pricing to 63% vectorized-parquet-reader time
  * and no reader knob moved it): does a [[operators.Layout.writeSorted]]
  * rewrite of lineitem — clustered on the GROUP columns, so the group keys
  * RLE-compress and the reader decodes fewer bytes — cut the
  * q_agg_pricing / q_agg_rollup wall time, and by how much vs the bytes cut?
  *
  * Measures, same window, warm, median of 3:
  *   - q_agg_pricing shape (Decimal128 money sums) on the ORIGINAL layout
  *     and on writeSorted(l_returnflag, l_linestatus);
  *   - the q_agg_rollup shape on both layouts;
  *   - the plain-double pricing sum on both (separates reader gain from
  *     Decimal128 constant);
  *   - on-disk bytes of both layouts + the rewrite's one-off cost.
  *
  * `runMain graft.AggLayoutBench` with SPARK_GRAFT_SF_DIR; one JSON line.
  */
object AggLayoutBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.harnessSessionFor(sfDir)
    spark.sparkContext.setLogLevel("WARN")
    val work = java.nio.file.Files.createTempDirectory("graft-agglayout").toFile
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
      f.delete(): Unit
    }
    def dirBytes(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(dirBytes).sum).getOrElse(0L)
      else f.length()
    try {
      val li = Tables.load(spark, sfDir, "lineitem")
      // Declare the RELY NDV facts up front so BOTH layouts probe with the
      // same optimizer license: a fresh READONLY session has an empty
      // per-JVM fact registry, so without the redeclare below the sorted
      // probe measured the PreAggregateGroupingSets-off plan — the r19
      // "+37% rollup regression" was the rule's absence, not the layout.
      Tables.declareDomainNdvs(spark, sfDir)

      def pricing(df: DataFrame): DataFrame = df
        .groupBy("l_returnflag", "l_linestatus")
        .agg(plans.Decimal128.sumMoney(col("l_quantity")).as("sum_qty"),
          plans.Decimal128.sumMoney(col("l_extendedprice")).as("sum_base_price"),
          plans.Decimal128.sum128(plans.Decimal128.mul(
            plans.Decimal128.scaled(col("l_extendedprice"), 2),
            lit(10000L) - plans.Decimal128.scaled(col("l_discount"), 4)), 6)
            .as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")

      def pricingDouble(df: DataFrame): DataFrame = df
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")

      def rollupQ(df: DataFrame): DataFrame = {
        Tables.declareDomainNdvs(spark, sfDir)
        df.rollup("l_returnflag", "l_linestatus")
          .agg(plans.Decimal128.sumMoney(col("l_quantity")).as("sum_qty"),
            plans.Decimal128.sumMoney(col("l_extendedprice")).as("sum_price"),
            count(lit(1)).as("n_rows"))
      }

      def timed(body: => Unit): Double = {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      def medianOf3(body: => Unit): Double = {
        body // warm
        Seq.fill(3)(timed(body)).sorted.apply(1)
      }
      def fmt(v: Double, s: Int = 3) = BigDecimal(v).setScale(s, BigDecimal.RoundingMode.HALF_UP)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]

      def probeAll(tag: String, df: DataFrame): Unit =
        for ((ptag, probe) <- Seq("pricing" -> pricing _, "pricing_double" -> pricingDouble _,
                                  "rollup" -> rollupQ _)) {
          val sec = medianOf3(probe(df).write.format("noop").mode("overwrite").save())
          out += s""""${tag}_$ptag":${fmt(sec)}"""
        }

      probeAll("original", li)
      out += s""""original_bytes":${dirBytes(new java.io.File(sfDir, "lineitem.parquet"))}"""

      // row-group size is a knob: the sorted rewrite lands in ~6 fat files
      // (range partitioning on a 6-value key), so group granularity sets
      // scan-split balance — SPARK_GRAFT_AGGLAYOUT_RG overrides (bytes).
      // KEEP=path writes there and leaves it; READONLY=path skips the write
      // and probes an existing rewrite from a clean session (separates the
      // layout's own effect from post-write session pressure — the 405 s
      // sf100 write precedes the probes in the default one-session run).
      val rg = sys.env.get("SPARK_GRAFT_AGGLAYOUT_RG").map(_.toLong)
      val keep = sys.env.get("SPARK_GRAFT_AGGLAYOUT_KEEP")
      val readonly = sys.env.get("SPARK_GRAFT_AGGLAYOUT_READONLY")
      val path = readonly.orElse(keep)
        .getOrElse(new java.io.File(work, "sorted_groupkeys").toString)
      if (readonly.isEmpty) {
        out += s""""rewrite_sec":${fmt(timed(
          operators.Layout.writeSorted(li, path, Seq("l_returnflag", "l_linestatus"),
            rowGroupBytes = rg)), 1)}"""
        System.gc(); Thread.sleep(1000)
      }
      out += s""""sorted_bytes":${dirBytes(new java.io.File(path))}"""
      val sorted = spark.read.parquet(path)
      // carry the facts onto the probed copy (write-time auto-carry only
      // reaches the WRITING session's registry; READONLY probes run in a
      // fresh JVM)
      plans.Constraints.redeclare(li, sorted)
      probeAll("sorted", sorted)

      println(s"""{"metric":"agg_layout_bench","sf":"$sfDir",${out.mkString(",")}}""")
    } finally {
      deleteRec(work)
      spark.stop()
    }
  }
}
