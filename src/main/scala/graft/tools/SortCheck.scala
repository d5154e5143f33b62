package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Print the executed plan of the q_sessionize_bucketed PIPELINE (pre-
  * presentation-sort — the registered row's checkpoint truncates its plan),
  * the evidence artifact for the "zero exchanges, zero sorts over the
  * bucket-sorted layout" claim. Pass `nolegacy` as a second arg to show the
  * counterfactual: with `spark.sql.legacy.bucketedTableScan.outputOrdering`
  * off (the Spark 3.0+ default) the scan hides its sort metadata and the
  * window re-sorts data already sorted on disk.
  *
  * Usage: runMain graft.tools.SortCheck <sfDir> [nolegacy]
  */
object SortCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = Tables.harnessSessionFor(sfDir)
    if (args.length > 1 && args(1) == "nolegacy")
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
    val pipe = graft.streaming.EventStreams.sessionize(
        graft.operators.Bucketing.table(spark, SparkEntry.bucketedEvents(spark, sfDir)))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), max(col("session_seq")).as("n_sessions"))
    println(pipe.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
