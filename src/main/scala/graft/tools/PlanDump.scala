package graft.tools

import graft.{SparkEntry, Tables}

/** Print the formatted physical plan of registered queries — the evidence
  * artifact for plan-shape claims (e.g. "the presentation sort is a
  * parallel range sort, not a 1-partition exchange").
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <query>[,<query>...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args
    val spark = Tables.harnessSessionFor(sfDir)
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { n =>
      println(s"==== $n ====")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
