package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation selections: percentile gates and token-budget fills —
  * the "data mixture" operations between scoring and training.
  *
  * Both are single-window selections: ONE shuffle on the cohort key, then a
  * rank/prefix-sum filter inside the partition. Deterministic (total
  * tie-break ordering) and engine-portable — the DuckDB oracles recompute
  * the same selections with identical window algebra.
  *
  * Scale shape: only `(id, cohort, score/tokens)` widths shuffle; document
  * bodies stay behind (callers semi-join winners back by id, the
  * q_pipeline_corpus pattern). Cohort cardinality bounds parallelism — gate
  * by language/source (dozens-to-thousands of cohorts), not by corpus.
  */
object Curation {

  /** Keep rows at or above `minPercentile` of `score` within each cohort —
    * "top half by quality per language". `percent_rank` is rank-based, so
    * ties share a rank and the kept SET is deterministic even when the
    * in-tie order is not.
    *
    * NULL scores are pinned FIRST (= worst, dropped by any gate > 0) —
    * explicitly, because engines disagree on the default (Spark ASC is
    * NULLS FIRST, DuckDB's is NULLS LAST); oracle SQL must say NULLS FIRST.
    */
  def percentileGate(df: DataFrame, score: Column, cohort: Seq[Column],
                     minPercentile: Double): DataFrame = {
    require(minPercentile >= 0.0 && minPercentile <= 1.0,
      s"percentileGate: minPercentile $minPercentile outside [0,1]")
    require(!df.columns.contains("__graft_pr"),
      "percentileGate: input already has a '__graft_pr' column — rename it first")
    val w = Window.partitionBy(cohort: _*).orderBy(score.asc_nulls_first)
    df.withColumn("__graft_pr", percent_rank().over(w))
      .filter(col("__graft_pr") >= minPercentile)
      .drop("__graft_pr")
  }

  /** Greedy token-budget fill per cohort: order by `priority` (best first,
    * tie-broken by `tieBreak` for determinism), keep rows while the running
    * token total stays within `budget`. The standard mixture-curation step —
    * "up to N tokens per source, best-quality first". A single row larger
    * than `budget` is never kept (its own running total already exceeds it).
    *
    * NULL priorities are pinned LAST (= worst) and NULL tie-breaks FIRST,
    * explicitly — Spark's defaults, but DuckDB defaults to NULLS LAST on ASC
    * too, so the oracle SQL must pin NULLS FIRST on the tie-break.
    */
  def tokenBudget(df: DataFrame, tokens: Column, priority: Column,
                  tieBreak: Column, cohort: Seq[Column], budget: Long): DataFrame = {
    require(budget > 0, s"tokenBudget: budget must be positive, got $budget")
    require(!df.columns.contains("__graft_cum"),
      "tokenBudget: input already has a '__graft_cum' column — rename it first")
    val w = Window.partitionBy(cohort: _*)
      .orderBy(priority.desc_nulls_last, tieBreak.asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__graft_cum", sum(tokens).over(w))
      .filter(col("__graft_cum") <= budget)
      .drop("__graft_cum")
  }
}
