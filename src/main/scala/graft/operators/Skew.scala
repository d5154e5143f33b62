package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling join helpers.
  *
  * AQE's skew-join split handles most runtime skew; salting is the static
  * counterpart for the pathological case AQE can't fix — a *shuffle* join
  * where a handful of keys dominate and the non-skewed side is too big to
  * broadcast. The large side gets a random salt in [0, factor); the smaller
  * side is replicated `factor`× with every salt value, so each hot key
  * spreads over `factor` reducers instead of one.
  */
object Skew {

  /** Salted inner equi-join of `large` (skewed) with `small` (replicated).
    * Result columns = large's + small's (join keys deduplicated like
    * `join(..., Seq(key))`).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, largeKey: String,
                 smallKey: String, factor: Int = 8): DataFrame = {
    require(factor > 0)
    val salted = large.withColumn("__salt", (rand(seed = 42) * factor).cast("int"))
    // shuffle_hash, not sort-merge: the whole point of salting is that the
    // large side streams through evenly-spread reducers — a sort-merge join
    // would SORT both shuffled sides (the large side's sort being exactly
    // the per-reducer cost salting exists to bound), while a shuffled hash
    // join builds its map from the replicated-small partition and streams
    // the large side unsorted.
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(factor - 1))))
      .hint("shuffle_hash")
    salted
      .join(replicated,
        salted(largeKey) === replicated(smallKey) && salted("__salt") === replicated("__salt"))
      .drop(replicated("__salt"))
      .drop(replicated(smallKey)) // dedupe the join key like join(..., Seq(key))
      .drop("__salt")
  }

  /** Top-N heavy-hitter keys of `df` on `key` — the diagnostic used to decide
    * whether salting (or AQE skew thresholds) are needed. One aggregate scan.
    */
  def keySkewProfile(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col(key))
      .limit(topN)
}
