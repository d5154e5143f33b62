package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.TextExpressions

/** Exact-substring deduplication (Lee et al. 2022, "Deduplicating Training
  * Data Makes Language Models Better" — the ExactSubstr method): find and
  * remove every text span of ≥ `minTokens` tokens that occurs more than
  * once ANYWHERE in the corpus. The exact complement to the approximate
  * family: whole-doc MinHash dilutes an embedded copied paragraph,
  * winnowing samples fingerprints (guaranteed detection only at ≥ w+k−1
  * tokens, and only as candidates) — ExactSubstr removes the literal
  * repeated bytes themselves, which is what the paper shows matters for LM
  * memorization.
  *
  * Distributed shape (the paper builds a single-machine suffix array;
  * Spark's equivalent works on the k-gram occurrence stream):
  *
  *  1. Per doc, ONE scan-stage pass emits position-ordered 48-bit k-gram
  *     hashes ([[graft.plans.TextExpressions.kgramHashes]] — md5-based, so
  *     the whole pipeline has an exact DuckDB twin, unlike xxhash64).
  *  2. `posexplode` → `(doc, pos, h)` triples; a doc's span is flagged iff
  *     its gram hash occurs > 1 time corpus-wide. The duplicate-hash
  *     relation comes from ONE count aggregate over `h` alone (8-byte rows
  *     — bodies never ride the exchange), and flags return via a
  *     narrow-row semi-join.
  *  3. Per doc, flagged positions merge into maximal covered spans with
  *     the gap-window trick (new span iff `pos > prev_pos + k`, the
  *     sessionization pattern): a flagged pos covers tokens
  *     `[pos, pos+k−1]`, so overlapping/adjacent coverage fuses. Spans
  *     shorter than `minTokens` are dropped.
  *
  * Cost honesty: step 2 shuffles one row per token position — the same
  * cost class as the paper's suffix-array construction, paid as Spark
  * exchanges instead of sort memory; there is no cheaper exact method.
  * k = minTokens/2 halves detection granularity below the removal
  * threshold (any repeated run of ≥ minTokens tokens contains a repeated
  * aligned k-gram, so nothing removable is missed).
  *
  * One deliberate coarsening vs the paper: coverage merging is
  * PARTNER-BLIND — two sub-threshold repeats (possibly matching different
  * partners) whose coverage overlaps or touches fuse into one span, which
  * can then clear `minTokens`. The error is conservative (removes
  * boilerplate-adjacent repeats the suffix array would keep) and the
  * removal side of dedup tolerates over-approximation; tracking per-partner
  * run identity would require shipping (doc, pos, partner) triples — a
  * quadratic blowup on viral grams.
  *
  * HASH-COLLISION HONESTY — "exact" is exact only up to the gram hash
  * space. Detection keys on a hash of the gram, not the gram itself, so a
  * birthday collision between two DISTINCT grams falsely flags both
  * positions, and two false flags within k tokens of each other fuse (the
  * partner-blind merge) into a span that can reach `minTokens` (at the
  * k=25/minTokens=50 defaults, exactly two adjacent false flags suffice) —
  * deleting genuine, never-duplicated text. Expected rates: with N gram
  * positions and a b-bit hash, falsely-colliding pairs ≈ N²/2^(b+1);
  * a position's chance of a second false flag within k is then
  * ≈ (N/2^b)·2k. At the default 48 bits this is negligible to ~10^9
  * positions (sf-scale corpora) but UNACCEPTABLE at 100 TB (~10^13
  * positions → ~10^11 colliding pairs). `wideHash = true` switches to the
  * 64-bit md5 head (same digest — zero extra scan cost): ~10^7 colliding
  * pairs at 10^13 positions and ~10²-10³ false SPANS corpus-wide —
  * the production setting whenever the corpus outgrows ~10^10 grams. The
  * 48-bit default exists because it is the value DuckDB can recompute
  * exactly (the oracle twin); results between the two differ only where a
  * 48-bit collision actually lands. For provable-zero false removal,
  * re-verify surviving spans by token equality against their partners —
  * deliberately not implemented: it ships (doc, pos, partner) triples,
  * the quadratic-on-viral-grams blowup described above, to remove a
  * ~10³-span error in a 10^13-token corpus. The recommendation is
  * EXECUTABLE: pass `wideHash = ExactSubstr.wideHashFor(nGrams)` instead
  * of the raw default so a production corpus can't ship 48 bits by
  * accident (the arithmetic above, as code: [[expectedFalseSpans]]).
  */
object ExactSubstr {

  /** Expected corpus-wide count of FALSE repeated spans (genuine text
    * deleted) from gram-hash birthday collisions, for a corpus of
    * `nGramPositions` total k-gram positions under a `bits`-wide hash —
    * the scaladoc's collision arithmetic as a function. Derivation: a
    * position is falsely flagged with probability ≈ N/2^b (some other
    * distinct gram collides with it); a span needs a SECOND false flag
    * within the ±k merge window (≈ (N/2^b)·2k); summed over N positions
    * and halved for pair double-count: ≈ N³·k/2^(2b). Reproduces the
    * documented anchors: ~10^11 at (10^13, 48) — unacceptable — and
    * ~10² at (10^13, 64).
    */
  def expectedFalseSpans(nGramPositions: Double, bits: Int, k: Int = 25): Double =
    math.pow(nGramPositions, 3) * k / math.pow(2.0, 2.0 * bits)

  /** The bit-width policy, executable: `true` iff the 48-bit oracle-exact
    * default would be expected to falsely delete more than
    * `tolerableFalseSpans` genuine spans at this corpus size (default: one
    * span corpus-wide). Crosses at ~1.5×10^9 gram positions — sf-scale
    * corpora stay on 48 bits (DuckDB-recomputable), anything
    * production-sized gets the 64-bit md5 head at zero extra scan cost.
    * Usage: `repeatedSpans(docs, wideHash = ExactSubstr.wideHashFor(n))`
    * with `n` from a cheap `sum(token_count)` pre-pass or the ingest
    * manifest.
    */
  def wideHashFor(nGramPositions: Long, k: Int = 25,
                  tolerableFalseSpans: Double = 1.0): Boolean =
    expectedFalseSpans(nGramPositions.toDouble, bits = 48, k = k) > tolerableFalseSpans

  /** Maximal repeated spans per document: `(doc_id, span_start, span_end,
    * span_tokens)` in 0-based token indices, `span_end` inclusive.
    */
  def repeatedSpans(docs: DataFrame, k: Int = 25, minTokens: Int = 50,
                    idCol: String = "doc_id", textCol: String = "text",
                    wideHash: Boolean = false): DataFrame = {
    require(k > 0 && minTokens >= k,
      s"ExactSubstr.repeatedSpans: need 0 < k=$k <= minTokens=$minTokens")
    Seq(idCol, textCol).foreach(c => require(docs.columns.contains(c),
      s"ExactSubstr.repeatedSpans: input has no '$c' column"))
    val occ = docs.filter(col(textCol).isNotNull)
      .select(col(idCol),
        posexplode(TextExpressions.kgramHashes(col(textCol), k,
          bits = if (wideHash) 64 else 48)).as(Seq("pos", "h")))
    // duplicate grams: global occurrence count over JUST the hash column
    val dup = occ.groupBy(col("h")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1).select("h")
    val flagged = occ.join(dup, Seq("h"), "left_semi")
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    flagged
      .withColumn("__new", when(col("pos") > lag(col("pos"), 1).over(w) + k, 1)
        .when(lag(col("pos"), 1).over(w).isNull, 1).otherwise(0))
      .withColumn("__span", sum(col("__new")).over(w))
      .groupBy(col(idCol), col("__span"))
      .agg(min(col("pos")).as("span_start"), (max(col("pos")) + k - 1).as("span_end"))
      .withColumn("span_tokens", col("span_end") - col("span_start") + 1)
      .filter(col("span_tokens") >= minTokens)
      .select(idCol, "span_start", "span_end", "span_tokens")
  }

  /** Per-document removal summary — the corpus-hygiene report shape:
    * `(doc_id, n_tokens, n_spans, n_tokens_removed)`; docs with no
    * repeated span report zeros. All integers: exact cross-engine.
    */
  def removalStats(docs: DataFrame, k: Int = 25, minTokens: Int = 50,
                   idCol: String = "doc_id", textCol: String = "text",
                   wideHash: Boolean = false): DataFrame = {
    val spans = repeatedSpans(docs, k, minTokens, idCol, textCol, wideHash)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"), sum(col("span_tokens")).as("n_tokens_removed"))
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol),
        // r21: native one-pass TokStats instead of the interpreted
        // split/filter chain (same count — TokStats.ntok counts \s-runs —
        // except the degenerate zero-token text, where TokStats reports the
        // [""]-artifact 1; the rlike guard restores the 0 the split form
        // produced). ExactSubstrSpec pins the empty/whitespace rows.
        when(col(textCol).rlike("\\S"),
            graft.functions.TextFunctions.tokenCount(col(textCol)))
          .otherwise(lit(0)).as("n_tokens"))
      .join(spans, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_tokens_removed"), lit(0L)).as("n_tokens_removed"))
  }

  /** The cleaned corpus: repeated spans cut out of each document (tokens
    * re-joined with single spaces — ExactSubstr operates on the token
    * stream, so original inter-token whitespace inside a doc is already
    * normalized by tokenization). Documents reduced to nothing drop;
    * documents with NULL text cannot carry spans and pass through
    * unchanged (text stays NULL).
    */
  def removeRepeated(docs: DataFrame, k: Int = 25, minTokens: Int = 50,
                     idCol: String = "doc_id", textCol: String = "text",
                     wideHash: Boolean = false): DataFrame = {
    val spans = repeatedSpans(docs, k, minTokens, idCol, textCol, wideHash)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("__spans"))
    val toks = filter(split(trim(col(textCol)), "\\s+"), t => t =!= lit(""))
    docs.filter(col(textCol).isNotNull)
      .join(spans, Seq(idCol), "left")
      .withColumn("__kept", when(col("__spans").isNull, toks).otherwise(
        // keep token i unless some span covers it (spans per doc are few —
        // the exists() is over the span list, not the corpus)
        filter(transform(toks, (t, i) =>
            when(exists(col("__spans"),
              s => i >= s.getField("span_start") && i <= s.getField("span_end")),
              lit(null)).otherwise(t)),
          t => t.isNotNull)))
      // only drop docs REDUCED to nothing by span removal — a doc that was
      // already empty (no spans) passes through untouched
      .filter(col("__spans").isNull || size(col("__kept")) > 0)
      .select(col(idCol), concat_ws(" ", col("__kept")).as(textCol))
      // null-text docs skip span detection entirely — union them back so a
      // downstream stage never silently loses rows (they keep NULL text,
      // matching the scaladoc's only-reduced-to-nothing-drops rule)
      .unionByName(docs.filter(col(textCol).isNull)
        .select(col(idCol), col(textCol)))
  }
}
