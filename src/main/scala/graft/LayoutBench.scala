package graft

import org.apache.spark.sql.functions._

/** Layout evidence: the SAME range probes against three physical layouts of
  * lineitem — the as-generated file, `Layout.writeSorted(l_partkey)`, and
  * `Layout.writeZOrdered(l_partkey, l_suppkey)` — measured warm (median of
  * 3). The point the q_zorder_key bench row cannot show: the generated
  * testdata interleaves keys across row groups so NO engine zone-map-skips
  * it; these are the numbers after the layout operator has done its job
  * (the write cost is reported too — it is `repartitionByRange + sort`,
  * paid once per table rewrite).
  *
  * `runMain graft.LayoutBench` with SPARK_GRAFT_SF_DIR; one JSON line out.
  */
object LayoutBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.harnessSessionFor(sfDir)
    spark.sparkContext.setLogLevel("WARN")
    val work = java.nio.file.Files.createTempDirectory("graft-layoutbench").toFile
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
      f.delete(): Unit
    }
    try {
      val li = Tables.load(spark, sfDir, "lineitem")
      // 8 MB row groups in every REWRITTEN layout so skipping granularity is
      // identical across them; the original file keeps its own groups.
      val rg = Some(8L << 20)
      def timed(body: => Unit): Double = {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      // range probes sized to ~5% of each key domain
      val pMax = li.agg(max("l_partkey")).head().getLong(0)
      val sMax = li.agg(max("l_suppkey")).head().getLong(0)
      def probeA(df: org.apache.spark.sql.DataFrame) = df
        .filter(col("l_partkey").between(pMax / 2, pMax / 2 + pMax / 20))
        .agg(sum("l_extendedprice"), count(lit(1)))
      def probeB(df: org.apache.spark.sql.DataFrame) = df
        .filter(col("l_suppkey").between(sMax / 2, sMax / 2 + sMax / 20))
        .agg(sum("l_extendedprice"), count(lit(1)))
      def medianOf3(body: => Unit): Double = {
        body // warm
        val ts = Seq.fill(3)(timed(body)).sorted
        ts(1)
      }
      def fmt(v: Double, s: Int = 3) = BigDecimal(v).setScale(s, BigDecimal.RoundingMode.HALF_UP)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      def probeBoth(tag: String, df: org.apache.spark.sql.DataFrame): Unit =
        for ((ptag, probe) <- Seq("partkey_range" -> probeA _, "suppkey_range" -> probeB _)) {
          val sec = medianOf3(probe(df).write.format("noop").mode("overwrite").save())
          out += s""""${tag}_$ptag":${fmt(sec)}"""
        }
      probeBoth("original", li)
      // ONE rewritten layout on disk at a time — at sf100 the range-shuffle
      // spill + two 11 GB outputs together exceed the box's free disk; the
      // System.gc() lets the ContextCleaner drop the rewrite's shuffle files
      // before the next one runs.
      for ((tag, write) <- Seq[(String, String => Unit)](
          "sorted_partkey" -> (p => operators.Layout.writeSorted(li, p, Seq("l_partkey"), rowGroupBytes = rg)),
          "zordered" -> (p => operators.Layout.writeZOrdered(li, p, "l_partkey", "l_suppkey", rowGroupBytes = rg)))) {
        val path = new java.io.File(work, tag).toString
        out += s""""rewrite_${tag}_sec":${fmt(timed(write(path)), 1)}"""
        // drop the rewrite's shuffle garbage BEFORE timing probes — the
        // first sf100 run measured the sorted probes 10x slow purely from
        // post-write heap/cleaner pressure
        System.gc(); Thread.sleep(1000)
        probeBoth(tag, spark.read.parquet(path))
        deleteRec(new java.io.File(path))
        System.gc(); Thread.sleep(1000)
      }
      println(s"""{"metric":"layout_bench","sf":"$sfDir",${out.mkString(",")}}""")
    } finally {
      deleteRec(work)
      spark.stop()
    }
  }
}
