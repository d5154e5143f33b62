package graft.tools

/** Driver t1 equivalent: SparkEntry.entry must return rows on sf0.001.
  * `require`, not `assert` — an assertion-elided build must still fail
  * loudly on an empty flagship result. Dir overridable for other machines.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001"))
    val spark = graft.Tables.harnessSessionFor(dir)
    // dir threads through to entry too (ADVICE r20: entry hardcoded its own
    // path, so the override only tuned the session's split size)
    val n = graft.SparkEntry.entry(spark, dir).count()
    println(s"[smoke] entry rows = $n")
    require(n > 0, "flagship entry returned no rows")
    spark.stop()
  }
}
