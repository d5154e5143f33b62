package graft.operators

import graft.SparkSpec

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val K = 3
  private val W = 2

  /** Independent model: k-gram md5s, min per full window of w, distinct. */
  private def model(text: String, k: Int = K, w: Int = W): Set[String] = {
    def md5(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val toks = text.trim.split("\\s+").filter(_.nonEmpty)
    val grams = (0 to toks.length - k).map(i => md5(toks.slice(i, i + k).mkString(" ")))
    (0 to grams.length - w).map(p => grams.slice(p, p + w).min).toSet
  }

  test("fingerprints match the independent model; short docs emit nothing") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four"),      // 2 grams → 1 full window → 1 fp
      (3L, "tiny doc"),                // < k tokens → no grams
      (4L, "just four tokens"),        // 1 gram < w → no full window
      (5L, "  spaced   out  tokens here   ")
    ).toDF("doc_id", "text")
    val got = Winnow.fingerprints(docs, k = K, w = W)
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got(1L) == model("alpha beta gamma delta epsilon zeta"))
    assert(got(2L) == model("one two three four") && got(2L).size == 1)
    assert(!got.contains(3L) && !got.contains(4L))
    assert(got(5L) == model("spaced out tokens here"))
  }

  test("the winnowing guarantee: a shared passage of w+k-1 tokens always collides") {
    // passage of exactly w+k-1 = 4 tokens embedded in unrelated contexts
    val passage = "copied passage appears here"
    val docs = Seq(
      (10L, s"lead in words then $passage and trailing context words"),
      (11L, s"totally different opening $passage closing differently entirely"),
      (12L, "nothing in common with anything else at all")
    ).toDF("doc_id", "text")
    val shared = Winnow.sharedPassages(docs, k = K, w = W)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(shared.nonEmpty, "shared passage produced no common fingerprint")
    assert(shared.forall(_._2 == 2L))
    val pairs = Winnow.dupCandidates(docs, k = K, w = W, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((10L, 11L)), s"wrong candidate pairs: $pairs")
  }

  test("boilerplate cap: a fingerprint above maxDocFreq never generates pairs") {
    // IDENTICAL docs so EVERY fingerprint has document frequency exactly 10
    // — a unique per-doc prefix would make straddle-window fingerprint
    // frequencies depend on md5 ordering luck (review finding: the old
    // assertion held only because one straddle fp happened to land at
    // frequency 1). Capping at 5 must yield ZERO pairs instead of 45.
    val docs = (0L until 10L).map(i =>
      (i, "standard footer text repeated everywhere always unchanged"))
      .toDF("doc_id", "text")
    val pairs = Winnow.dupCandidates(docs, k = K, w = W, minShared = 1, maxDocFreq = 5)
    assert(pairs.count() == 0)
    // raising the cap reinstates the pairing
    assert(Winnow.dupCandidates(docs, k = K, w = W, minShared = 1, maxDocFreq = 100)
      .count() == 45)
  }

  test("deterministic under repartitioning; guards fire") {
    val docs = (0L until 30L).map(i =>
      (i, s"document $i with some moderately long shared vocabulary tail ${i % 3}"))
      .toDF("doc_id", "text")
    val a = Winnow.fingerprints(docs).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = Winnow.fingerprints(docs.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b)
    intercept[IllegalArgumentException] { Winnow.fingerprints(docs, k = 0) }
    intercept[IllegalArgumentException] { Winnow.fingerprints(docs.withColumnRenamed("text", "t")) }
    intercept[IllegalArgumentException] { Winnow.fingerprints(docs.withColumn("fp", org.apache.spark.sql.functions.lit(1))) }
    intercept[IllegalArgumentException] { Winnow.dupCandidates(docs, maxDocFreq = 1) }
  }

  test("fp-index daily loop: probe drops passage copies; index side reads co-located") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
    val helper = new AdaptiveSparkPlanHelper {}
    dropTables("wn_fps")
    val passage = "widely copied boilerplate passage text"
    val day0 = Seq(
      (1L, s"original document containing the $passage inside it somewhere"),
      (2L, "unrelated seed content nothing shared here at all")).toDF("doc_id", "text")
    Winnow.writeFpIndex(day0, "wn_fps", 4, k = K, w = W)

    // day 1: one doc copies the day-0 passage, one is clean
    val day1 = Seq(
      (10L, s"fresh framing around the $passage with new surroundings"),
      (11L, "completely novel material with zero overlap today")).toDF("doc_id", "text")
    val kept1 = Winnow.passageIncremental(day1, Bucketing.table(spark, "wn_fps"), k = K, w = W)
    assert(kept1.select("doc_id").as[Long].collect().toSet == Set(11L))
    Winnow.appendFpIndex(kept1, "wn_fps", 4, k = K, w = W)

    // day 2: a copy of DAY 1's survivor passage must be caught via the append
    val day2 = Seq(
      (20L, "completely novel material with zero overlap today rephrased"),
      (21L, "another untouched document entirely its own words")).toDF("doc_id", "text")
    val kept2 = Winnow.passageIncremental(day2, Bucketing.table(spark, "wn_fps"), k = K, w = W)
    kept2.collect()
    assert(kept2.select("doc_id").as[Long].collect().toSet == Set(21L))

    // the scale property, pinned on the OPERATOR'S OWN executed plan: the
    // bucketed index feeds the viral gate, the anti-join, and the probe
    // join without ever re-partitioning on fp — an fp-keyed exchange with
    // the index scan in its subtree would mean the stored layout was
    // re-shuffled. (The narrow post-join hit rows DO shuffle, on
    // (__graft_new, id) — that exchange rightly has the scan upstream.)
    val plan = kept2.queryExecution.executedPlan
    val shuffles = helper.collectWithSubqueries(plan) {
      case s: ShuffleExchangeLike => s
    }
    val offenders = shuffles.filter(s =>
      s.outputPartitioning.toString.contains("fp#") && s.toString.contains("wn_fps"))
    assert(offenders.isEmpty,
      s"index side of passageIncremental re-shuffles on fp:\n${offenders.mkString("\n")}")

    // drifted parameters fail loudly instead of matching nothing
    val drifted = intercept[Exception] {
      Winnow.passageIncremental(day2, Bucketing.table(spark, "wn_fps"),
        k = K + 1, w = W).collect()
    }
    assert(drifted.getMessage.contains("rebuild the index"), drifted.getMessage)
    // reserved-column guard
    intercept[IllegalArgumentException] {
      Winnow.passageIncremental(
        day2.withColumn("__graft_new", org.apache.spark.sql.functions.lit(1)),
        Bucketing.table(spark, "wn_fps"), k = K, w = W)
    }
    dropTables("wn_fps")
  }

  test("batch-side viral gate: boilerplate concentrated in the day's batch is dropped") {
    dropTables("wn_viral")
    val passage = "shared footer passage appearing everywhere today"
    val day0 = Seq(
      (1L, s"indexed original with the $passage embedded in it")).toDF("doc_id", "text")
    Winnow.writeFpIndex(day0, "wn_viral", 2, k = K, w = W)
    // six batch docs all carry the footer → its fps have batch df 6 > 5:
    // gated out, so the docs survive (hot-key fan-out never materializes)
    val batch = (10L until 16L).map(i =>
      (i, s"doc number $i unique words here then the $passage at the end"))
      .toDF("doc_id", "text")
    val idx = Bucketing.table(spark, "wn_viral")
    val gated = Winnow.passageIncremental(batch, idx, k = K, w = W, maxDocFreq = 5)
    assert(gated.count() == 6L, "batch-viral fps must be gated out of the probe")
    // with the cap lifted the same batch is caught against the index
    val ungated = Winnow.passageIncremental(batch, idx, k = K, w = W, maxDocFreq = 100)
    assert(ungated.count() == 0L, "below the cap the passage hits must drop the docs")
    dropTables("wn_viral")
  }

  test("plan: the native fingerprint pass runs with ZERO exchanges") {
    val docs = (0L until 50L).map(i => (i, s"doc $i alpha beta gamma delta ${i % 5}"))
      .toDF("doc_id", "text")
    val fp = Winnow.fingerprints(docs)
    fp.collect()
    val p = fp.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!"(?i)exchange".r.findAllIn(p).hasNext,
      s"per-document winnowing must not shuffle:\n$p")
  }

  test("native fingerprints match the columnar pipeline exactly") {
    // unicode + ties + short docs + control-char edges, both parameter sets
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "répété répété répété répété répété répété répété"),  // identical grams → tie-heavy
      (3L, "日本語 トークン 混在 テキスト の 例 です ね"),
      (4L, "tiny"),
      (5L, " ctrl lead trail mixed ws nbsp stays one token here"),
      (6L, (0 until 200).map(i => s"w${i % 17}").mkString(" "))
    ).toDF("doc_id", "text")
    for ((k, w) <- Seq((3, 2), (5, 4), (1, 1))) {
      val native = Winnow.fingerprints(docs, k, w).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      val columnar = Winnow.fingerprintsColumnar(docs, k, w).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(native == columnar, s"native/columnar diverge at k=$k w=$w: " +
        s"only-native=${native -- columnar} only-columnar=${columnar -- native}")
    }
  }
}
