package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("percentileGate keeps the top half per cohort; ties keep the whole rank") {
    val df = Seq(
      ("a", 1L, 0.1), ("a", 2L, 0.2), ("a", 3L, 0.3), ("a", 4L, 0.4),
      ("b", 5L, 0.9), ("b", 6L, 0.9), ("b", 7L, 0.1) // tie at the top
    ).toDF("cohort", "id", "score")
    val kept = Curation.percentileGate(df, col("score"), Seq(col("cohort")), 0.5)
      .select("id").as[Long].collect().toSet
    // cohort a: pr = 0, 1/3, 2/3, 1 → keep 3,4; cohort b: 0.9s share pr 0.5 → both kept
    assert(kept == Set(3L, 4L, 5L, 6L))
  }

  test("percentileGate single-row cohort has percent_rank 0 (kept only at gate 0)") {
    val df = Seq(("solo", 1L, 0.99)).toDF("cohort", "id", "score")
    assert(Curation.percentileGate(df, col("score"), Seq(col("cohort")), 0.5).isEmpty)
    assert(Curation.percentileGate(df, col("score"), Seq(col("cohort")), 0.0).count() == 1)
  }

  test("percentileGate pins NULL scores first: dropped by any gate > 0, ranks unshifted") {
    val df = Seq(
      ("a", 1L, Option(0.9)), ("a", 2L, Option(0.1)), ("a", 3L, Option.empty[Double])
    ).toDF("cohort", "id", "score")
    val kept = Curation.percentileGate(df, col("score"), Seq(col("cohort")), 0.5)
      .select("id").as[Long].collect().toSet
    // NULLS FIRST pinned: null pr 0 (dropped), 0.1 pr 0.5, 0.9 pr 1 → keep {1,2};
    // under DuckDB's default NULLS LAST the null would have been KEPT at pr 1
    assert(kept == Set(1L, 2L))
  }

  test("tokenBudget fills best-first until the cap; oversize rows never fit") {
    val df = Seq(
      // (id, cohort, tokens, quality)
      (1L, "s", 300, 0.9), (2L, "s", 300, 0.8), (3L, "s", 300, 0.7), (4L, "s", 50, 0.6),
      (5L, "t", 9999, 0.99), (6L, "t", 100, 0.5)
    ).toDF("id", "cohort", "tok", "q")
    val kept = Curation.tokenBudget(df, col("tok"), col("q"), col("id"),
      Seq(col("cohort")), budget = 700L)
      .select("id").as[Long].collect().toSet
    // s: 300(q.9)+300(q.8)=600 ≤ 700, +300 would be 900 → id 3 out, and the
    // greedy prefix stops there (id 4 at cum 950 is also out — prefix, not knapsack)
    // t: 9999 alone blows the budget at its own row → only id 6? NO: 5 sorts
    // first (q .99), cum 9999 > 700 → dropped; 6 lands at cum 10099 → dropped too
    assert(kept == Set(1L, 2L))
  }

  test("tokenBudget is deterministic under quality ties (tieBreak column)") {
    val df = Seq((1L, "s", 400, 0.5), (2L, "s", 400, 0.5), (3L, "s", 400, 0.5))
      .toDF("id", "cohort", "tok", "q")
    val kept = Curation.tokenBudget(df, col("tok"), col("q"), col("id"),
      Seq(col("cohort")), budget = 800L)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L), "ties must resolve by ascending tieBreak, not partition order")
  }

  test("invalid parameters rejected") {
    val df = Seq((1L, "s", 1, 0.5)).toDF("id", "cohort", "tok", "q")
    intercept[IllegalArgumentException](
      Curation.percentileGate(df, col("q"), Seq(col("cohort")), 1.5))
    intercept[IllegalArgumentException](
      Curation.tokenBudget(df, col("tok"), col("q"), col("id"), Seq(col("cohort")), 0L))
  }

  test("helper-column collisions rejected, not silently overwritten (ADVICE r6)") {
    import spark.implicits._
    val pr = Seq(("a", 1.0, "x")).toDF("id", "score", "cohort")
      .withColumn("__graft_pr", lit(0.0))
    intercept[IllegalArgumentException](
      Curation.percentileGate(pr, col("score"), Seq(col("cohort")), 0.5))
    val cum = Seq(("a", 1.0, 10L, "x")).toDF("id", "q", "tok", "cohort")
      .withColumn("__graft_cum", lit(0L))
    intercept[IllegalArgumentException](
      Curation.tokenBudget(cum, col("tok"), col("q"), col("id"), Seq(col("cohort")), 100L))
  }
}
