package graft

import org.apache.spark.sql.functions._

/** The 100 TB swap-ins the exact queries document: mergeable sketches.
  *
  * `q_agg_quantiles` computes exact percentiles (full per-group value buffer)
  * and `q_agg_topcust`-style aggregates count exactly — both are fine until
  * the per-group state stops fitting. These tests pin the approximate
  * replacements Spark ships (`approx_percentile`, `approx_count_distinct`,
  * DataSketches HLL with explicit sketch columns) against their exact twins
  * with error bounds, so "swap in the sketch at scale" is a verified path,
  * not a comment. The HLL case also proves MERGEABILITY — per-partition
  * sketches union to the global answer, the property that lets 1000
  * executors pre-aggregate independently and combine fixed-size state.
  */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  // 20k rows, 8 groups, values 0..999 uniform-ish (deterministic LCG),
  // ~1500 distinct users with a skewed (power-law-ish) distribution
  private lazy val rows = {
    var seed = 12345L
    def next(): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L; seed >>> 17 }
    (1 to 20000).map { i =>
      val g = (next() % 8).toInt
      val v = (next() % 1000).toDouble
      val u = (next() % 1500) min (next() % 1500) // skew toward low ids
      (i.toLong, s"g$g", v, u)
    }.toDF("id", "grp", "v", "user")
  }

  test("approx_percentile tracks exact percentile within 1% of the value range per group") {
    val joined = rows.groupBy("grp")
      .agg(
        expr("percentile(v, array(0.25D, 0.5D, 0.75D, 0.95D))").as("exact"),
        expr("approx_percentile(v, array(0.25D, 0.5D, 0.75D, 0.95D), 1000)").as("approx"))
      .collect()
    assert(joined.length == 8)
    joined.foreach { r =>
      val e = r.getSeq[Double](1); val a = r.getSeq[Double](2)
      e.zip(a).foreach { case (ev, av) =>
        assert(math.abs(ev - av) <= 10.0, // 1% of the 0..999 range
          s"grp=${r.getString(0)}: exact=$ev approx=$av")
      }
    }
  }

  test("approx_count_distinct is within 5% of the exact distinct count") {
    val r = rows.agg(
      countDistinct(col("user")).as("exact"),
      approx_count_distinct(col("user"), rsd = 0.01).as("approx")).head()
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact <= 0.05, s"exact=$exact approx=$approx")
  }

  test("q_corpus_card_approx tracks the exact corpus card within sketch bounds") {
    // The registered approx twin of q_corpus_card (its 100 TB shape): the
    // exact columns must be IDENTICAL (same plan prefix) and the two sketch
    // columns must track the exact median / distinct count within bounds —
    // approx_percentile returns a GENUINE n_chars value, so with 10k
    // accuracy on sf0.001's per-language group sizes (hundreds of docs) it
    // lands exactly on the exact median or an immediate neighbor.
    val dir = "/root/testdata/sf0.001"
    val exact = SparkEntry.queries("q_corpus_card")(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    val approx = SparkEntry.queries("q_corpus_card_approx")(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(exact.keySet == approx.keySet && exact.nonEmpty)
    exact.keySet.foreach { lang =>
      val e = exact(lang); val a = approx(lang)
      assert(e.getLong(1) == a.getLong(1), s"$lang n_docs must be exact")
      assert(e.getLong(2) == a.getLong(2), s"$lang total_tokens must be exact")
      assert(e.getDouble(3) == a.getDouble(3), s"$lang avg_quality must be exact")
      // exact `percentile` INTERPOLATES the middle pair on even group sizes
      // while the sketch returns a genuine element (the lower middle), so
      // the gap is half the distance between the two middle values — a data
      // property, not sketch error; 5% covers it on this distribution
      val eMed = e.getDouble(4)
      val aMed = a.getLong(4).toDouble
      assert(math.abs(eMed - aMed) / math.max(eMed, 1.0) <= 0.05,
        s"$lang p50: exact=$eMed approx=$aMed")
      val eU = e.getLong(5).toDouble; val aU = a.getLong(5).toDouble
      assert(math.abs(eU - aU) / eU <= 0.05, s"$lang n_unique: exact=$eU approx=$aU")
    }
  }

  test("HLL sketches merge: per-group sketches union to the global distinct estimate") {
    // the distributed pattern: sketch per partition/group (fixed-size state),
    // union the sketches, estimate once — no re-scan, no exact set anywhere
    val perGroup = rows.groupBy("grp")
      .agg(hll_sketch_agg(col("user"), lit(14)).as("sk"))
    val merged = perGroup
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0).toDouble
    val exact = rows.agg(countDistinct(col("user"))).head().getLong(0).toDouble
    assert(math.abs(merged - exact) / exact <= 0.05, s"exact=$exact merged_est=$merged")
    // and the sketch column is bounded state, not a value list
    val skBytes = perGroup.select(length(col("sk"))).as[Int].collect()
    assert(skBytes.forall(_ < 64 * 1024), s"sketches must stay KB-sized, got ${skBytes.max}")
  }
}
