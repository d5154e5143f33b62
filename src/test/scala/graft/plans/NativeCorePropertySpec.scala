package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** Randomized-model tests for the pure-JVM cores of the round-8 native
  * expressions — no Spark session needed, so thousands of random cases are
  * cheap. The Spark-level parity specs (TopKAggregateSpec, WinnowSpec,
  * TfidfSpec) pin the plan integration on curated edges; these pin the
  * algorithms themselves against independent reference implementations on
  * seeded-random input (deterministic — a failure names its case).
  */
class NativeCorePropertySpec extends AnyFunSuite {

  // ---- TopKBuffer vs sort-take reference ----

  private def refTopK(entries: Seq[(java.lang.Double, Long)], k: Int): Seq[(Option[Long], Long)] = {
    // rank order: non-null first, score desc with NaN greatest and
    // -0.0 == 0.0 (normalized compare), id asc ties — the window twin.
    // Scores compared as NORMALIZED bits (the buffer stores the raw value
    // but -0.0/0.0 rank equal, so output order between them follows ids).
    entries.map { case (s, id) => (Option(s).map(_.doubleValue), id) }
      .sortWith { case ((s1, id1), (s2, id2)) =>
        (s1, s2) match {
          case (Some(a), Some(b)) =>
            val c = java.lang.Double.compare(a + 0.0, b + 0.0)
            if (c != 0) c > 0 else id1 < id2
          case (Some(_), None) => true
          case (None, Some(_)) => false
          case (None, None) => id1 < id2
        }
      }
      .take(k)
      .map { case (s, id) =>
        (s.map(d => java.lang.Double.doubleToLongBits(d + 0.0)), id) }
  }

  test("TopKBuffer insert+merge equals sort-take on 500 random cases") {
    val rnd = new scala.util.Random(20260813L)
    for (iter <- 0 until 500) {
      val n = rnd.nextInt(40)
      val entries = Seq.fill(n) {
        val s: java.lang.Double = rnd.nextInt(6) match {
          case 0 => null
          case 1 => java.lang.Double.valueOf(Double.NaN)
          case 2 => java.lang.Double.valueOf(0.0)
          case 3 => java.lang.Double.valueOf(-0.0)
          case _ => java.lang.Double.valueOf(math.floor(rnd.nextDouble() * 8) - 4)
        }
        (s, rnd.nextInt(10).toLong)
      }
      val k = 1 + rnd.nextInt(7)
      val splits = 1 + rnd.nextInt(4)
      // split into partial buffers then merge — exercises the merge path
      val groups = entries.zipWithIndex.groupBy(_._2 % splits).values.map(_.map(_._1))
      val merged = groups.foldLeft(new TopKBuffer(k)) { (acc, g) =>
        val b = new TopKBuffer(k)
        g.foreach { case (s, id) => b.insert(s == null, if (s == null) 0.0 else s, id) }
        acc.mergeIn(b); acc
      }
      val got = (0 until merged.n).map(i =>
        (if (merged.nulls(i)) None
         else Some(java.lang.Double.doubleToLongBits(merged.scores(i) + 0.0)), merged.ids(i)))
      assert(got == refTopK(entries, k),
        s"iter=$iter k=$k splits=$splits entries=$entries got=$got expect=${refTopK(entries, k)}")
    }
  }

  // ---- WinnowFps.compute vs independent model ----

  private def modelFps(text: String, k: Int, w: Int): Set[String] = {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val t = text.replaceAll("^\\s+|\\s+$", "").split("\\s+")
    val grams = (0 to t.length - k).map(i => md5hex(t.slice(i, i + k).mkString(" ")))
    (0 to grams.length - w).map(p => grams.slice(p, p + w).min).toSet
  }

  private def randomDoc(rnd: scala.util.Random): String = {
    val vocab = Array("a", "b", "ab", "xyz", "日本", "Z9")
    val seps = Array(" ", "  ", "\t", " \n ")
    val n = rnd.nextInt(40)
    val sb = new StringBuilder
    for (i <- 0 until n) {
      if (i > 0) sb.append(seps(rnd.nextInt(seps.length)))
      sb.append(vocab(rnd.nextInt(vocab.length)))
    }
    if (rnd.nextBoolean()) sb.insert(0, "  ")
    sb.toString
  }

  test("WinnowFps.compute equals the independent model on 500 random docs") {
    val rnd = new scala.util.Random(7L)
    for (iter <- 0 until 500) {
      val text = randomDoc(rnd)
      val k = 1 + rnd.nextInt(4)
      val w = 1 + rnd.nextInt(4)
      val arr = WinnowFps.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(text), k, w)
      val got = (0 until arr.numElements()).map(arr.getUTF8String(_).toString).toSet
      assert(got == modelFps(text, k, w), s"iter=$iter text='$text' k=$k w=$w")
    }
  }

  // ---- TermCounts.compute vs naive counting ----

  test("TermCounts.compute equals naive token counting on 500 random docs") {
    val rnd = new scala.util.Random(11L)
    for (iter <- 0 until 500) {
      val text = randomDoc(rnd)
      val row = TermCounts.compute(org.apache.spark.unsafe.types.UTF8String.fromString(text))
      val arr = row.getArray(1)
      val got = (0 until arr.numElements()).map { i =>
        val e = arr.getStruct(i, 2)
        e.getUTF8String(0).toString -> e.getInt(1)
      }.toMap
      val toks = text.replaceAll("^\\s+|\\s+$", "").split("\\s+")
      assert(row.getInt(0) == toks.length, s"iter=$iter ntok text='$text'")
      val expect = toks.filter(_.nonEmpty).groupBy(identity).view.mapValues(_.length).toMap
      assert(got == expect, s"iter=$iter text='$text'")
    }
  }

  // ---- BigramCounts.compute vs naive pair counting ----

  test("BigramCounts.compute equals naive bigram counting on 500 random docs") {
    val rnd = new scala.util.Random(12L)
    for (iter <- 0 until 500) {
      val text = randomDoc(rnd)
      val row = BigramCounts.compute(org.apache.spark.unsafe.types.UTF8String.fromString(text))
      val arr = row.getArray(1)
      val got = (0 until arr.numElements()).map { i =>
        val e = arr.getStruct(i, 3)
        (e.getUTF8String(0).toString, e.getUTF8String(1).toString) -> e.getInt(2)
      }.toMap
      val toks = text.replaceAll("^\\s+|\\s+$", "").split("\\s+")
      assert(row.getInt(0) == math.max(toks.length - 1, 0), s"iter=$iter nbg text='$text'")
      val expect = toks.zip(toks.drop(1)).groupBy(identity).view.mapValues(_.length).toMap
      assert(got == expect, s"iter=$iter text='$text'")
    }
  }
}
