package graft

/** Driver t1 mimic: `SparkEntry.entry` must return rows > 0 on sf0.001.
  * Run: `sbt "runMain graft.Smoke"`. Exits non-zero on an empty result so it
  * can gate commits the way the driver gates rounds.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    // the shared harness session (UTC timezone, UI off, tuned shuffle
    // partitions) — NOT a hand-rolled builder, which would silently drop the
    // UTC setting when run outside sbt's forked JVM options
    val spark = Tables.harnessSession(master = "local[4]")
    try {
      val n = SparkEntry.entry(spark).count()
      println(s"[smoke] entry rows=$n")
      if (n <= 0) sys.error("entry returned no rows")
    } finally spark.stop()
  }
}
