package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: remove training documents that share any word
  * n-gram with an evaluation/benchmark set — the standard guard against
  * test-set leakage in pretraining corpora (the reference engine has no
  * notion of this; it is a pipeline-mandate operator like Dedup/Curation).
  *
  * Matching contract: a document is contaminated iff at least one of its
  * distinct word `w`-grams (ShingleSet semantics — documents shorter than
  * `w` tokens contribute their whole token sequence as a single gram)
  * appears among the benchmark set's grams. Word-level n-gram overlap at
  * w≈8–13 is the published GPT-3/Llama decontamination recipe; `w` is a
  * parameter because the right width depends on vocabulary size.
  *
  * Scale shape (the part that matters at 100 TB): benchmark sets are tiny
  * (thousands of eval items) against a huge corpus, so the benchmark gram
  * set is BROADCAST — the corpus-side gram stream probes it map-side and
  * never shuffles. The only exchanges are the contaminated-id `distinct`
  * (id width) and the final anti-join, whose right side is the (small)
  * contaminated-id set — AQE turns that into a broadcast anti-join, so
  * document bodies never move.
  */
object Decontam {

  /** Distinct ids of `docs` sharing at least one word `w`-gram with `bench`. */
  def contaminatedIds(docs: DataFrame, bench: DataFrame,
                      idCol: String = "doc_id", textCol: String = "text",
                      w: Int = 4): DataFrame = {
    require(w > 0, s"Decontam: gram width must be positive, got $w")
    val benchGrams = bench
      .select(explode(graft.plans.TextExpressions.shingleSet(col(textCol), w)).as("__graft_gram"))
      .distinct()
    docs
      .select(col(idCol), explode(graft.plans.TextExpressions.shingleSet(col(textCol), w)).as("__graft_gram"))
      .join(broadcast(benchGrams), Seq("__graft_gram"), "left_semi")
      .select(idCol).distinct()
  }

  /** `docs` minus every document contaminated against `bench`.
    *
    * The anti-join is NULL-SAFE (`<=>`): a contaminated doc with a NULL id
    * must still be dropped — a plain `===` anti-join evaluates NULL = NULL
    * to NULL and would silently keep a benchmark-leaking row. Note ids are
    * the identity here, so all NULL-id docs share one identity: if ANY
    * NULL-id doc is contaminated, ALL NULL-id docs drop. Give rows unique
    * ids upstream if that conflation matters.
    */
  def decontaminate(docs: DataFrame, bench: DataFrame,
                    idCol: String = "doc_id", textCol: String = "text",
                    w: Int = 4): DataFrame = {
    require(!docs.columns.contains("__graft_contaminated"),
      "Decontam: input already has a '__graft_contaminated' column — rename it first")
    val bad = contaminatedIds(docs, bench, idCol, textCol, w)
      .withColumnRenamed(idCol, "__graft_contaminated")
    docs.join(bad, docs(idCol) <=> col("__graft_contaminated"), "left_anti")
  }
}
