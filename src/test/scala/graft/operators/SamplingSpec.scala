package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  private lazy val keys = {
    import spark.implicits._
    (0L until 5000L).toDF("k")
  }

  test("split assignment is deterministic, disjoint-exhaustive, and ~proportional") {
    val assigned = keys.select(col("k"),
      Sampling.splitAssign(col("k"), Seq("test" -> 0.1, "val" -> 0.1)).as("split"))
    val counts = assigned.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("test", "val", "train"))
    assert(counts.values.sum == 5000L)
    // binomial(5000, 0.1) is ~500 ± 21σ-ish; ±25% is far outside flake range
    assert(counts("test") > 375 && counts("test") < 625, s"test split ${counts("test")}")
    assert(counts("val") > 375 && counts("val") < 625, s"val split ${counts("val")}")
    // determinism: the same frame computed twice is identical
    val again = keys.select(col("k"),
      Sampling.splitAssign(col("k"), Seq("test" -> 0.1, "val" -> 0.1)).as("split"))
    assert(assigned.except(again).isEmpty && again.except(assigned).isEmpty)
  }

  test("assignment is stable under repartition and row-subset (pure key function)") {
    val full = keys.select(col("k"),
      Sampling.splitAssign(col("k"), Seq("test" -> 0.2)).as("split"))
    val shuffled = keys.repartition(17).filter(col("k") % 3 === 0)
      .select(col("k"), Sampling.splitAssign(col("k"), Seq("test" -> 0.2)).as("split"))
    val joined = full.withColumnRenamed("split", "a")
      .join(shuffled.withColumnRenamed("split", "b"), "k")
    assert(joined.filter(col("a") =!= col("b")).isEmpty)
  }

  test("deterministic sample is monotone in fraction (0.1 subset-of 0.2)") {
    val s1 = Sampling.deterministicSample(keys, col("k"), 0.1)
    val s2 = Sampling.deterministicSample(keys, col("k"), 0.2)
    assert(s1.except(s2).isEmpty, "sample(0.1) not a subset of sample(0.2)")
    assert(s2.count() > s1.count())
  }

  test("NULL key falls through to the default split") {
    val df = spark.sql("SELECT cast(null as bigint) AS k")
      .select(Sampling.splitAssign(col("k"), Seq("test" -> 0.5)).as("split"))
    assert(df.head.getString(0) == "train")
  }

  test("invalid fractions are rejected") {
    intercept[IllegalArgumentException](Sampling.splitAssign(col("k"), Seq("a" -> 0.6, "b" -> 0.4)))
    intercept[IllegalArgumentException](Sampling.splitAssign(col("k"), Seq.empty))
    intercept[IllegalArgumentException](Sampling.hexThreshold(1.5))
  }

  test("NULL keys are in NO sample at any fraction — 1.0 is the limit of f<1 (ADVICE r6)") {
    val df = spark.sql("SELECT cast(null as bigint) AS k UNION ALL SELECT 7")
    assert(Sampling.deterministicSample(df, col("k"), 1.0).count() == 1L,
      "fraction 1.0 must exclude NULL keys like every smaller fraction")
    assert(Sampling.deterministicSample(df, col("k"), 0.9999).count() <= 1L)
    // inSample is a total boolean: never NULL, even for NULL keys
    (Seq(0.0, 0.5, 0.9999, 1.0)).foreach { f =>
      assert(df.select(Sampling.inSample(col("k"), f).as("in"))
        .filter(col("in").isNull).isEmpty, s"inSample($f) returned NULL")
    }
  }

  test("fraction edges: 0 keeps nothing, 1.0 keeps EVERY row (no ffffffff hole)") {
    assert(Sampling.hexThreshold(0.0) == "00000000")
    assert(Sampling.deterministicSample(keys, col("k"), 0.0).isEmpty)
    // 1.0 must short-circuit to true — a strict `<` against the clamped max
    // threshold "ffffffff" would drop keys whose hash prefix is exactly that
    assert(Sampling.deterministicSample(keys, col("k"), 1.0).count() == 5000L)
  }

  test("stratifiedSample keeps each stratum at its own fraction, deterministically") {
    import spark.implicits._
    val df = (0L until 4000L).map(k => (k, s"src${k % 4}")).toDF("k", "src")
    val kept = Sampling.stratifiedSample(df, col("k"), col("src"),
      Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.0), defaultFraction = 0.1)
    val counts = kept.groupBy("src").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("src0") == 1000L)
    assert(counts("src1") > 375 && counts("src1") < 625, s"src1 ${counts("src1")}")
    assert(!counts.contains("src2"))
    assert(counts("src3") > 50 && counts("src3") < 150, s"src3 ${counts("src3")}")
    // per-stratum decisions reuse inSample: the kept set within a stratum is
    // exactly the deterministic sample of that stratum at its fraction
    val src1Direct = Sampling.deterministicSample(
      df.filter(col("src") === "src1"), col("k"), 0.5)
    val src1Strat = kept.filter(col("src") === "src1")
    assert(src1Strat.except(src1Direct).isEmpty && src1Direct.except(src1Strat).isEmpty)
  }

  test("stratifiedSample: NULL stratum falls through to the default fraction") {
    import spark.implicits._
    val df = (0L until 1000L).map(k => (k, None: Option[String])).toDF("k", "src")
    val kept0 = Sampling.stratifiedSample(df, col("k"), col("src"),
      Map("src0" -> 1.0), defaultFraction = 0.0)
    assert(kept0.isEmpty)
    val kept1 = Sampling.stratifiedSample(df, col("k"), col("src"),
      Map("src0" -> 0.0), defaultFraction = 1.0)
    assert(kept1.count() == 1000L)
  }

  test("temperatureFractions: T=1 is proportional, T→0 equalizes, rates cap at 1") {
    val counts = Map("big" -> 900L, "small" -> 100L)
    val t1 = Sampling.temperatureFractions(counts, 1.0, targetTotal = 500L)
    // T=1: every source keeps the same rate targetTotal/total
    assert(math.abs(t1("big") - 0.5) < 1e-12 && math.abs(t1("small") - 0.5) < 1e-12)
    val t0 = Sampling.temperatureFractions(counts, 0.001, targetTotal = 200L)
    // T→0: equal SHARES (100 rows each) → small source rate ~1.0, big ~0.111
    assert(t0("small") > 0.95 && t0("big") < 0.15)
    // cap: a tiny source asked for more rows than it has clamps to 1.0
    val capped = Sampling.temperatureFractions(Map("a" -> 10L, "b" -> 10L), 1.0, 1000L)
    assert(capped("a") == 1.0 && capped("b") == 1.0)
    intercept[IllegalArgumentException](Sampling.temperatureFractions(Map.empty, 1.0, 10L))
    intercept[IllegalArgumentException](Sampling.temperatureFractions(Map("a" -> 0L), 1.0, 10L))
    intercept[IllegalArgumentException](Sampling.temperatureFractions(Map("a" -> 1L), 0.0, 10L))
  }

  test("fixedSizeSample: exact n per stratum, repartition-stable, subset-monotone, NULLs excluded") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = ((0L until 100L).map(i => (Some(i), if (i % 3 == 0) "a" else "b"))
      :+ (Option.empty[Long], "a")).toDF("k", "s")
    val out = Sampling.fixedSizeSample(df, col("k"), col("s"), 7)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.count(_._2 == "a") == 7 && out.count(_._2 == "b") == 7)
    // deterministic under repartitioning
    val out2 = Sampling.fixedSizeSample(df.repartition(11), col("k"), col("s"), 7)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSet == out2.toSet)
    // growing n only ADDS members (hash order is a total ranking)
    val out10 = Sampling.fixedSizeSample(df, col("k"), col("s"), 10)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out.toSet.subsetOf(out10))
    // a stratum smaller than n yields all its rows, no padding
    val tiny = Seq((1L, "x"), (2L, "x")).toDF("k", "s")
    assert(Sampling.fixedSizeSample(tiny, col("k"), col("s"), 5).count() == 2)
  }
}
