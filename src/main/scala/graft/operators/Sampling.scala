package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and split assignment for training
  * pipelines.
  *
  * `df.sample()` is seed-stable only for a fixed partitioning of a fixed
  * plan — repartition the corpus (or rescale the cluster) and the sampled SET
  * changes. Training-data splits need the opposite contract: the same record
  * lands in the same split forever, on any engine, at any parallelism. That
  * is a pure function of the record key: hash the key, compare the hex prefix
  * against a fraction threshold. md5 is used (not xxhash64) precisely because
  * every engine implements it identically — the assignment is reproducible
  * in DuckDB/Trino/pandas byte-for-byte, so the DuckDB oracle checks the
  * actual split, not a lookalike.
  *
  * Scale shape: per-row hash of an already-present key column inside the
  * scan projection — no shuffle, no state, trivially codegen'd.
  *
  * NULL-key contract (uniform across every fraction, including 1.0): a NULL
  * key has no hash, cannot be deterministically assigned, and is therefore
  * in NO sample — `inSample` is `false` for it at every fraction, so
  * `deterministicSample(1.0)` IS the limit of `deterministicSample(f)`.
  * `splitAssign` is the one place NULLs survive: its CASE cascade sends them
  * to the default split (same CASE semantics in SQL), because split
  * assignment must be exhaustive.
  */
object Sampling {

  /** Lowercase hex md5 of the key's string form (engine-portable). */
  def keyHash(key: Column): Column = md5(key.cast("string").cast("binary"))

  /** 8-hex-char threshold: keys whose hash prefix sorts below it are "in".
    * Granularity 2^-32 of the requested fraction.
    */
  private[operators] def hexThreshold(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction outside [0,1]")
    f"${math.floor(fraction * 4294967296.0).toLong.min(0xffffffffL)}%08x"
  }

  /** Deterministic membership flag for a `fraction` sample keyed on `key`.
    * Monotone in `fraction`: sample(0.1) is a subset of sample(0.2). Always
    * a non-NULL boolean; NULL keys are `false` at EVERY fraction (see the
    * NULL-key contract above — no discontinuity at 1.0).
    * `fraction = 1.0` keeps every non-NULL-keyed row — the strict `<`
    * against a clamped max threshold would silently drop keys whose hash
    * prefix is exactly "ffffffff" (~1 in 2^32 — real keys at corpus scale).
    */
  def inSample(key: Column, fraction: Double): Column = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction outside [0,1]")
    if (fraction == 1.0) key.isNotNull
    else coalesce(substring(keyHash(key), 1, 8) < lit(hexThreshold(fraction)), lit(false))
  }

  /** Deterministic sample: keep `fraction` of rows keyed on `key`. */
  def deterministicSample(df: org.apache.spark.sql.DataFrame, key: Column,
                          fraction: Double): org.apache.spark.sql.DataFrame =
    df.filter(inSample(key, fraction))

  /** Per-stratum deterministic sampling — the "domain mixing" selection: each
    * stratum (source/domain/language) keeps its own fraction, every decision
    * still a pure function of the record key (subset-stable, engine-portable,
    * monotone per stratum like [[inSample]]). Strata not named in `fractions`
    * — and NULL strata (every `===` comparison is null → the CASE falls
    * through) — use `defaultFraction`.
    */
  def stratifiedSample(df: org.apache.spark.sql.DataFrame, key: Column, strata: Column,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 0.0): org.apache.spark.sql.DataFrame = {
    require(fractions.nonEmpty, "stratifiedSample: need at least one stratum fraction")
    val cond = fractions.toSeq.sortBy(_._1).foldLeft(Option.empty[Column]) {
      case (acc, (name, f)) =>
        val c = inSample(key, f)
        Some(acc.fold(when(strata === name, c))(_.when(strata === name, c)))
    }.get.otherwise(inSample(key, defaultFraction))
    df.filter(cond)
  }

  /** Fixed-SIZE deterministic sample per stratum — the eval-set-construction
    * shape ("exactly 1000 held-out docs per language"), where a fraction
    * can't promise a count. Keeps the `n` rows with the LOWEST key hashes in
    * each stratum: still a pure function of the keys present, so the kept
    * set is stable under repartitioning and engine-portable (the DuckDB
    * oracle recomputes it), and growing the corpus only swaps members whose
    * hashes displace the old order — it never reshuffles arbitrarily the
    * way seed-based `sampleBy` does. Ties on the full 32-hex hash are broken
    * by the hash again lexicographically, then by the key's string form, so
    * the selection is total. NULL keys follow the uniform contract above:
    * never sampled.
    *
    * ONE shuffle on the stratum (the [[graft.operators.Curation]] window
    * shape); only (key-hash, stratum) widths matter to the sort. A
    * stratum's row count bounds its window partition — stratify by
    * language/source, not by something unbounded.
    *
    * Keys should be UNIQUE within a stratum: duplicate key VALUES tie on
    * the full hash-and-key order, so the kept KEY multiset is still
    * deterministic but WHICH physical row carries the non-key columns past
    * the cutoff is partition-arrival order — the same caller contract as
    * [[graft.operators.Lines]]' id uniqueness.
    */
  def fixedSizeSample(df: org.apache.spark.sql.DataFrame, key: Column, strata: Column,
                      n: Int): org.apache.spark.sql.DataFrame = {
    require(n > 0, s"fixedSizeSample: n must be positive, got $n")
    require(!df.columns.contains("__graft_fsrank"),
      "fixedSizeSample: input already has a '__graft_fsrank' column — rename it first")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strata).orderBy(keyHash(key), key.cast("string"))
    df.filter(key.isNotNull)
      .withColumn("__graft_fsrank", row_number().over(w))
      .filter(col("__graft_fsrank") <= n)
      .drop("__graft_fsrank")
  }

  /** Temperature-weighted mixture rates (pure driver-side arithmetic): given
    * per-source row counts n_s, the target mixture share is p_s ∝ n_s^T —
    * T = 1 is natural proportions, T → 0 equalizes sources, the usual
    * multilingual/domain rebalancing knob. Returns each source's KEEP
    * fraction r_s = min(1, targetTotal · p_s / n_s) for [[stratifiedSample]].
    *
    * One-shot: a source capped at 1.0 can't deliver its full share, so the
    * realized total lands below `targetTotal` in that case — callers needing
    * the exact total re-run with the shortfall redistributed (water-filling),
    * which stays a driver-side loop over a dozen numbers.
    */
  def temperatureFractions(counts: Map[String, Long], temperature: Double,
                           targetTotal: Long): Map[String, Double] = {
    require(counts.nonEmpty, "temperatureFractions: need at least one source count")
    require(counts.values.forall(_ > 0), "temperatureFractions: counts must be positive")
    require(temperature > 0.0, s"temperatureFractions: temperature must be > 0, got $temperature")
    require(targetTotal >= 0, s"temperatureFractions: targetTotal must be >= 0, got $targetTotal")
    val weights = counts.map { case (s, n) => s -> math.pow(n.toDouble, temperature) }
    val z = weights.values.sum
    counts.map { case (s, n) =>
      s -> math.min(1.0, targetTotal * (weights(s) / z) / n.toDouble)
    }
  }

  /** Split assignment as a CASE cascade over cumulative thresholds:
    * `splits = Seq("test" -> 0.1, "val" -> 0.1)` sends ~10% to "test",
    * the next ~10% to "val", everything else (and NULL keys) to `default`.
    * Disjoint and exhaustive by construction; stable under data growth —
    * a record's split never changes when other records arrive.
    */
  def splitAssign(key: Column, splits: Seq[(String, Double)],
                  default: String = "train"): Column = {
    require(splits.nonEmpty, "need at least one named split")
    val total = splits.map(_._2).sum
    require(total < 1.0, s"named splits sum to $total; must leave room for '$default'")
    val h = substring(keyHash(key), 1, 8)
    val cumulative = splits.scanLeft(0.0)(_ + _._2).tail
    val cased = splits.zip(cumulative).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), cum)) =>
        val cond = h < lit(hexThreshold(cum))
        Some(acc.fold(when(cond, lit(name)))(_.when(cond, lit(name))))
    }.get
    cased.otherwise(lit(default))
  }
}
