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
    val spark = Tables.harnessSession()
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
    def medians(once: String => Double): Map[String, Double] = {
      val samples = scala.collection.mutable.Map(variants.map(_ -> List.empty[Double]): _*)
      for (_ <- 1 to Samples; v <- variants) samples(v) = once(v) :: samples(v)
      variants.map(v => v -> samples(v).sorted.apply(samples(v).size / 2)).toMap
    }

    val sf1 = medians(once)
    val hot = Tables.load(spark, sfDir, "orders")
      .filter(col("o_custkey") === 7).count()

    // Second scenario: skew HEAVY enough that one reducer's work dominates
    // the stage. At sf1's 1.5 M orders the hot partition is ~340 k rows ≈
    // 0.1 s of reducer work — under the noise floor, so salting's
    // replication overhead outweighs its benefit there (the sf1 numbers
    // SHOW that, deliberately: salting is not free and must be earned).
    // Here: 20 M rows, 40% on ONE key, vs a 200 k-row dim too big to
    // broadcast — the naive plan sorts an 8 M-row partition on one core.
    def heavyOnce(variant: String): Double = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled",
        (variant == "plain_aqe").toString)
      val large = spark.range(0L, 20000000L, 1L, 64).select(
        when(col("id") % 5 < 2, lit(7L)).otherwise(col("id") % 200000L).as("k"),
        (col("id") % 1000L).as("v"))
      val dim = spark.range(0L, 200000L).select(col("id").as("dk"),
        (col("id") % 97L).cast("double").as("weight"))
      val joined = variant match {
        case "salted" => operators.Skew.saltedJoin(large, dim, "k", "dk", factor = 32)
        case _        => large.join(dim, col("k") === col("dk"))
      }
      val t0 = System.nanoTime()
      joined.groupBy(col("v")).agg(count(lit(1)).as("n"), sum(col("weight")).as("w"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    heavyOnce("plain_aqe") // warm codegen for the synthetic shape
    val heavy = medians(heavyOnce)

    def js(m: Map[String, Double]) =
      variants.map(v => "\"" + v + "\":" + m(v)).mkString(",")
    println(s"""{"metric":"skew_join","sf":"$sfDir","hot_key_rows":$hot,${js(sf1)},""" +
      s""""heavy":{"rows":20000000,"hot_share":0.4,${js(heavy)}}}""")
    spark.stop()
  }
}
