package graft

import org.apache.spark.sql.functions._

/** The q_line_dedup "hash prefilter" experiment (BASELINE.md): same query
  * shape as the registered q_line_dedup, string-keyed winner exchange vs the
  * xxhash64-keyed exchange with in-bucket exact verify
  * (Lines.dedupLines(hashedExchange)). Interleaved samples, medians printed,
  * plus a result-parity count check so a wrong-answer variant can't win.
  * Run: SPARK_GRAFT_SF_DIR=... `runMain graft.LineDedupBench [samples]`.
  */
object LineDedupBench {
  def main(args: Array[String]): Unit = {
    val samples = if (args.nonEmpty) args(0).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata/sf10")
    val spark = Tables.harnessSessionFor(sfDir)

    def q(hashed: Boolean) = {
      val aug = Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"),
          regexp_replace(col("text"), "(\\S+\\s+\\S+)\\s+", "$1\n").as("text"))
      operators.Lines.dedupLines(aug, "doc_id", "text", "\n", hashedExchange = hashed)
        .select("doc_id", "text", "n_lines_kept", "n_lines_dropped")
    }

    // parity first (cheap aggregate over both outputs)
    val par = Seq(false, true).map { h =>
      q(h).agg(count(lit(1)), sum("n_lines_kept"), sum("n_lines_dropped"),
        sum(length(col("text")))).head().toSeq
    }
    println(s"parity: string=${par(0)} hashed=${par(1)} equal=${par(0) == par(1)}")

    // warm
    Tables.load(spark, sfDir, "documents").write.format("noop").mode("overwrite").save()
    val times = scala.collection.mutable.Map("string" -> Vector.empty[Double],
      "hashed" -> Vector.empty[Double])
    for (i <- 1 to samples; (label, h) <- Seq("string" -> false, "hashed" -> true)) {
      val t0 = System.nanoTime()
      q(h).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      times(label) :+= dt
      println(f"$label sample $i: $dt%.3f s")
    }
    def median(v: Vector[Double]) = v.sorted.apply(v.size / 2)
    println(f"MEDIAN string=${median(times("string"))}%.3f s hashed=${median(times("hashed"))}%.3f s")
    spark.stop()
  }
}
