package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tokenizer-vocabulary construction — the corpus statistic every
  * tokenizer-training run starts from: the term frequency table and its
  * cumulative-coverage curve ("the top k terms cover X% of all token
  * occurrences"), which is how vocabulary sizes are chosen and how OOV
  * rates are estimated before committing to a vocab.
  *
  * Scale shape: per-document term counting happens INSIDE the scan via the
  * native [[graft.plans.TextExpressions.termCounts]] (no token occurrence
  * ever rides an exchange — the same discipline as [[Tfidf]]); the only
  * corpus-sized shuffle is the vocabulary aggregate on `term`, with
  * map-side partial sums. Everything after is vocabulary-sized: the total
  * rides a scalar subquery over the materialized frequency table (NOT a
  * second corpus pass), the top-k is a `TakeOrderedAndProject` (per-
  * partition partial top-k, no global sort shuffle), and the coverage
  * prefix-sum windows over only the k kept rows.
  */
object Vocab {

  /** Corpus-wide `(term, n)` frequency table. NULL texts contribute
    * nothing; tokenization is the shared whitespace contract
    * ([[graft.functions.TextFunctions.tokens]]) so oracles recompute
    * identical terms.
    */
  def termFrequencies(docs: DataFrame, textCol: String = "text"): DataFrame = {
    require(docs.columns.contains(textCol),
      s"Vocab.termFrequencies: input has no '$textCol' column")
    docs
      .select(explode(graft.plans.TextExpressions.termCounts(col(textCol))
        .getField("entries")).as("__e"))
      .select(col("__e.term").as("term"), col("__e.n").cast("long").as("__cnt"))
      .groupBy("term")
      .agg(sum(col("__cnt")).as("n"))
  }

  /** The coverage curve's top-`k` rows:
    * `(rank, term, n, cum_n, cum_frac)` with `rank` by (n desc, term) —
    * the total, engine-portable order — and `cum_frac` = running token
    * share rounded to 6dp. To pick a vocab for a target coverage, keep
    * rows while `cum_frac < target` (+1): the first rank at or past the
    * target is the vocabulary size.
    *
    * The frequency table is materialized once (lazy local checkpoint) —
    * it feeds both the total and the top-k, and a pure plan would tokenize
    * the corpus twice (Catalyst duplicates subtrees per consumer; the
    * same measured trap as [[Tfidf.tfidf]]). The single-partition window
    * is bounded by `k`, never by the vocabulary.
    */
  def coverage(docs: DataFrame, k: Int, textCol: String = "text"): DataFrame = {
    require(k > 0, s"Vocab.coverage: k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val freq = termFrequencies(docs, textCol).localCheckpoint(eager = false)
    val total = org.apache.spark.sql.graftshim.ColumnShim.scalarSubquery(
      freq.agg(sum(col("n")).cast("double").as("t")))
    val order: Seq[Column] = Seq(desc("n"), col("term"))
    val w = Window.orderBy(order: _*).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    freq.orderBy(order: _*).limit(k)
      .withColumn("rank", row_number().over(Window.orderBy(order: _*)))
      .withColumn("cum_n", sum(col("n")).over(w))
      .withColumn("cum_frac", round(col("cum_n") / total, 6))
      .select("rank", "term", "n", "cum_n", "cum_frac")
  }
}
