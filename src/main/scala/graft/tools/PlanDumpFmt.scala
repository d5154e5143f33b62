package graft.tools

import java.nio.file.{Files, Paths}

import graft.{SparkEntry, Tables}

/** Write `explain("formatted")` for registered queries to files — the
  * optimization-round evidence artifact (plans/rNN/<query>_<suffix>.txt):
  * the judge checks plan-shape claims (Exchange count, join strategy,
  * PushedFilters/ReadSchema) against these dumps and the code.
  *
  * Usage: runMain graft.tools.PlanDumpFmt <sfDir> <outDir> <suffix> <q>[,<q>...]
  */
object PlanDumpFmt {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, names) = args
    val spark = Tables.harnessSessionFor(sfDir)
    Files.createDirectories(Paths.get(outDir))
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { n =>
      val txt =
        try SparkEntry.queries(n)(spark, sfDir)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        catch { case scala.util.control.NonFatal(e) =>
          s"FAILED to plan: ${e.getMessage}"
        }
      Files.write(Paths.get(outDir, s"${n}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] wrote $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
