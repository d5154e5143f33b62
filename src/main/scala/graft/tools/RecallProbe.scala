package graft.tools

import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}

/** Measure the production IVF cost/recall point: recall@k of
  * `q_ann_ivf_probe` (nprobe=2 of nlist=8) against the exact `q_ann_ivf`
  * run (nprobe=nlist ≡ brute force) on the same query set, plus both
  * probe latencies in one warm session (build memoized and excluded, like
  * Bench's prewarm). Prints one JSON line for BASELINE.md.
  *
  * Usage: runMain graft.tools.RecallProbe <sfDir>
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir) = args
    val spark = Tables.harnessSessionFor(sfDir)
    SparkEntry.prewarmStoredArtifacts(spark, sfDir,
      keep = n => n == "q_ann_ivf" || n == "q_ann_ivf_probe")
    def timed(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both plans once, then time (Bench's discipline)
    Seq("q_ann_ivf", "q_ann_ivf_probe").foreach(timed)
    val tExact = timed("q_ann_ivf")
    val tProbe = timed("q_ann_ivf_probe")
    val exact = SparkEntry.queries("q_ann_ivf")(spark, sfDir)
      .select(col("query_id"), col("vec_id"))
    val approx = SparkEntry.queries("q_ann_ivf_probe")(spark, sfDir)
      .select(col("query_id"), col("vec_id"))
    val hits = approx.join(exact, Seq("query_id", "vec_id"), "left_semi").count()
    val total = exact.count()
    val recall = hits.toDouble / total
    println(f"""{"sf":"$sfDir","recall_at_5":$recall%.4f,"exact_sec":$tExact%.3f,"probe_sec":$tProbe%.3f,"hits":$hits,"total":$total}""")
    spark.stop()
  }
}
