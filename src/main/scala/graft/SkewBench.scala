package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measured skew demonstration (VERDICT r7 task 8): the sf1 orders table
  * plants one hot customer (~22% of all orders on a single key —
  * `tools/gen_sf.py`), and this main times the q_join_salted aggregate over
  * a FORCED shuffle join (autoBroadcastJoinThreshold=-1 — the regime salting
  * exists for; a broadcast join has no per-key reducer to overload) in three
  * configurations:
  *
  *   plain_naive   — plain join, AQE skew-split disabled: the unmitigated
  *                   baseline, one reducer owns the hot key end to end
  *   plain_aqe     — plain join, AQE skew-split enabled: Spark's own runtime
  *                   mitigation (splits the oversized partition post-shuffle)
  *   salted        — [[graft.operators.Skew.saltedJoin]]: static salting,
  *                   the mitigation that also works where AQE's cannot (skew
  *                   invisible at plan time on a non-AQE engine, or a
  *                   downstream stateful op pinned to the raw key layout)
  *
  * Medians of 3 interleaved noop-write samples, one JSON line — the same
  * measurement discipline as [[Bench]]. Run with
  * SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf1 (the skew plant only exists
  * there; at sf0.1 all three variants time the job floor).
  */
object SkewBench {
  private val Samples = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata/sf1")
    val spark = Tables.session()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def aggregate(joined: DataFrame): DataFrame = joined
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total_price"))

    def build(variant: String): DataFrame = {
      val orders = Tables.load(spark, sfDir, "orders")
      val customer = Tables.load(spark, sfDir, "customer")
      variant match {
        case "salted" =>
          aggregate(operators.Skew.saltedJoin(orders, customer, "o_custkey", "c_custkey"))
        case _ =>
          aggregate(orders.join(customer, col("o_custkey") === col("c_custkey")))
      }
    }

    def once(variant: String): Double = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled",
        (variant == "plain_aqe").toString)
      val t0 = System.nanoTime()
      build(variant).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // warm the page cache + codegen once
    Seq("orders", "customer").foreach(t =>
      Tables.load(spark, sfDir, t).write.format("noop").mode("overwrite").save())

    val variants = Seq("plain_naive", "plain_aqe", "salted")
    val samples = scala.collection.mutable.Map(variants.map(_ -> List.empty[Double]): _*)
    for (_ <- 1 to Samples; v <- variants) samples(v) = once(v) :: samples(v)
    def median(xs: List[Double]): Double = xs.sorted.apply(xs.size / 2)
    val fields = variants.map(v => "\"" + v + "\":" + median(samples(v))).mkString(",")
    val hot = Tables.load(spark, sfDir, "orders")
      .filter(col("o_custkey") === 7).count()
    println(s"""{"metric":"skew_join","sf":"$sfDir","hot_key_rows":$hot,$fields}""")
    spark.stop()
  }
}
