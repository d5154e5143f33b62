package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints + duplicate-passage detection — the
  * local-fingerprinting algorithm of Schleimer/Wilkerson/Aiken (SIGMOD'03,
  * the MOSS algorithm): hash every k-gram, then keep the MINIMUM hash of
  * each sliding window of `w` consecutive k-gram positions. Guarantee: any
  * shared passage of at least `w + k - 1` tokens contributes at least one
  * IDENTICAL fingerprint to both documents, while only ~2/(w+1) of the
  * k-grams are kept — the passage-level complement to the dedup family
  * (doc-level exact #32, MinHash near-dup #33, embedding SemDedup #73):
  * exact dedup misses a copied paragraph inside an otherwise-new document,
  * MinHash dilutes it below the whole-doc Jaccard threshold, and this
  * catches it.
  *
  * Engine-portable by construction: tokens come from the shared whitespace
  * contract, gram hashes are `md5` hex strings (identical in DuckDB), and
  * the window minimum is plain SQL window algebra — so the whole pipeline
  * has an exact cross-engine oracle, unlike the xxhash64-based operators
  * (SURVEY §6). Winnowing proper breaks min-TIES toward the rightmost
  * position; since fingerprints are deduplicated per document by VALUE,
  * tie policy cannot change the output set and both engines agree for free.
  *
  * Scale shape: winnowing is per-document selection with no cross-row
  * state, so the fingerprint pass is a single native expression inside
  * the scan stage — ZERO exchanges; no k-gram ever becomes a row.
  * Downstream passage stats add one vocabulary-sized exchange on the
  * slim (id, fp) fingerprint rows.
  */
object Winnow {

  /** `(idCol, fp)` — the distinct winnowed fingerprints of each document.
    * Documents with fewer than `k + w - 1` tokens emit no rows (no full
    * window exists — same on the oracle side, where the trailing partial
    * frames are filtered out).
    *
    * Computed by the native [[graft.plans.TextExpressions.winnowFps]]
    * expression: winnowing is a purely per-document selection, so the
    * whole pass (tokenize → md5 k-grams → sliding min → distinct) runs
    * inside the scan stage with ZERO exchanges — no k-gram ever becomes a
    * row, nothing shuffles. The column-algebra formulation survives as
    * [[fingerprintsColumnar]] (bit-parity pinned in WinnowSpec); the
    * DuckDB oracle mirrors the columnar algebra, which the native output
    * matches exactly.
    */
  def fingerprints(docs: DataFrame, k: Int = 5, w: Int = 4,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    checkWinnowInputs(docs, k, w, idCol, textCol)
    docs.select(col(idCol),
      explode(graft.plans.TextExpressions.winnowFps(col(textCol), k, w)).as("fp"))
  }

  private def checkWinnowInputs(docs: DataFrame, k: Int, w: Int,
                                idCol: String, textCol: String): Unit = {
    require(k > 0 && w > 0, s"Winnow: k=$k and w=$w must be positive")
    Seq(idCol, textCol).foreach(c => require(docs.columns.contains(c),
      s"Winnow: input has no '$c' column"))
    Seq("fp", "__graft_p", "__graft_ng", "__graft_h").foreach(c =>
      require(!docs.columns.contains(c),
        s"Winnow: input already has a '$c' column — rename it first"))
  }

  /** The column-algebra twin of [[fingerprints]] — every step expressible
    * in portable SQL (the DuckDB oracle's shape). Kept as the parity
    * reference for the native expression; prefer [[fingerprints]]
    * everywhere else (this form pays a doc-id window exchange on exploded
    * k-gram rows).
    */
  private[operators] def fingerprintsColumnar(docs: DataFrame, k: Int = 5, w: Int = 4,
                                              idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    checkWinnowInputs(docs, k, w, idCol, textCol)
    val toks = graft.functions.TextFunctions.tokens(col(textCol))
    // gram construction reuses the ONE word-shingle definition
    // (HashFunctions.shingles — also the MinHash base), so the oracle SQL
    // has a single gram contract to mirror. Its short-doc whole-text
    // shingle emits one sub-k gram; the full-window filter below drops it
    // (ng ≤ 0), matching the oracle's len(t) >= k guard.
    val grams = docs
      .select(col(idCol), toks.as("__toks"))
      .select(col(idCol), size(col("__toks")).as("__graft_n"),
        posexplode(graft.functions.HashFunctions.shingles(col("__toks"), k))
          .as(Seq("__graft_p0", "__graft_g")))
      .select(col(idCol), (col("__graft_p0") + 1).as("__graft_p"),
        md5(col("__graft_g")).as("__graft_h"),
        // gram count rides the projection so the full-window filter needs
        // no second window pass
        (col("__graft_n") - k + 1).as("__graft_ng"))

    val frame = Window.partitionBy(col(idCol)).orderBy(col("__graft_p"))
      .rowsBetween(Window.currentRow, w - 1)
    grams
      .withColumn("fp", min(col("__graft_h")).over(frame))
      // only FULL windows fingerprint (trailing frames see < w grams)
      .filter(col("__graft_p") <= col("__graft_ng") - w + 1)
      // per-doc distinct WITHOUT a second exchange: the aggregate groups on
      // the window's own partition key, so the (id)-hash partitioning is
      // reused; fingerprints re-explode inside the same stage
      .groupBy(col(idCol))
      .agg(array_distinct(collect_list(col("fp"))).as("__fps"))
      .select(col(idCol), explode(col("__fps")).as("fp"))
  }

  /** Fingerprints appearing in at least `minDocs` distinct documents —
    * shared passages (≥ `w + k - 1` common tokens somewhere). One
    * fingerprint-keyed exchange over slim `(fp, count)` aggregates.
    */
  def sharedPassages(docs: DataFrame, k: Int = 5, w: Int = 4, minDocs: Int = 2,
                     idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(minDocs > 0, s"Winnow: minDocs=$minDocs must be positive")
    fingerprints(docs, k, w, idCol, textCol)
      .groupBy(col("fp"))
      // (id, fp) rows are distinct by construction, so count(*) IS the
      // distinct-document count — no count_distinct buffer needed
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
  }

  /** Materialize the fingerprint relation bucketed by `fp` — the
    * passage-dedup half of the daily-ingest storage story (the MinHash band
    * index's sibling, SURVEY §2 #66): with the index pre-shuffled on disk
    * by the probe key, the corpus side of every subsequent
    * [[passageIncremental]] reads co-located and contributes ZERO
    * exchanges; only the day's batch redistributes. The winnowing
    * parameters ride along as constant `(k, w)` columns (RLE — bytes on
    * disk) so every probe can verify them per-row: a drifted `k`/`w`
    * changes the gram hashes entirely, and the fp equi-join would
    * otherwise match NOTHING and silently wave every copy through — the
    * same silent-recall-collapse guard as `Dedup.minhashIncremental`.
    */
  def writeFpIndex(docs: DataFrame, table: String, buckets: Int,
                   k: Int = 5, w: Int = 4,
                   idCol: String = "doc_id", textCol: String = "text"): Unit =
    Bucketing.writeBucketed(indexRows(docs, k, w, idCol, textCol),
      table, buckets, Seq("fp"))

  /** Append a day's surviving batch to the fingerprint index (the one
    * shared bucketed-append recipe — drifted layouts fail loudly).
    */
  def appendFpIndex(docs: DataFrame, table: String, buckets: Int,
                    k: Int = 5, w: Int = 4,
                    idCol: String = "doc_id", textCol: String = "text"): Unit =
    Bucketing.appendBucketed(indexRows(docs, k, w, idCol, textCol),
      table, buckets, Seq("fp"))

  private def indexRows(docs: DataFrame, k: Int, w: Int,
                        idCol: String, textCol: String): DataFrame =
    fingerprints(docs, k, w, idCol, textCol)
      .withColumnRenamed(idCol, "id")
      .withColumn("k", lit(k)).withColumn("w", lit(w))

  /** Per-row `(k, w)` validation as a FILTER, not a projection — a
    * projection would replace the `fp` attribute and drop the bucketed
    * scan's partitioning (see `Dedup.validatedBandIndex` for the full
    * why). Raises at execution time on the first drifted row.
    */
  private def validatedFpIndex(fpIndex: DataFrame, k: Int, w: Int): DataFrame =
    fpIndex.filter(
      when(col("k") === k && col("w") === w, lit(true))
        .otherwise(raise_error(format_string(
          "graft.Winnow.passageIncremental: fp index built with k=%d, w=%d but call uses k=%d, w=%d — rebuild the index with matching parameters",
          col("k"), col("w"), lit(k), lit(w)))))

  /** The day's batch minus documents that share at least `minShared`
    * fingerprints with SOME single indexed document (the pairwise MOSS
    * criterion — a passage was copied FROM somewhere). Viral fingerprints
    * (document frequency > `maxDocFreq` on EITHER side — the indexed
    * corpus or the day's batch) are gated out first, like
    * [[dupCandidates]]: gating only the index side would let a footer
    * passage concentrated in the batch hit every matching indexed doc
    * (batch_df × index_df rows on one hot key); with both gates the join's
    * per-fp fan-out is bounded by maxDocFreq². Plan shape: the index side
    * reads co-located (its doc-frequency gate aggregates on the bucket key
    * and the anti-join matches the same partitioning — no exchange, no
    * unconditional driver broadcast of an unbounded viral set; AQE may
    * still choose broadcast when the set is measured small); the batch's
    * slim (id, fp) rows redistribute; hit pairs aggregate narrow. The
    * stored `(k, w)` columns are verified per-row — a drifted call fails
    * loudly instead of matching nothing. Within-batch passage dups are NOT
    * this operator's job — [[dupCandidates]] over the batch (or the
    * stream-side content dedup) handles those; the split mirrors
    * `Dedup.exactIncremental`'s contract.
    */
  def passageIncremental(newDocs: DataFrame, fpIndex: DataFrame,
                         k: Int = 5, w: Int = 4,
                         minShared: Int = 1, maxDocFreq: Int = 1000,
                         idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(minShared > 0 && maxDocFreq > 1,
      s"Winnow: minShared=$minShared must be positive and maxDocFreq=$maxDocFreq > 1")
    Seq("id", "fp", "k", "w").foreach(c => require(fpIndex.columns.contains(c),
      s"Winnow: fingerprint index has no '$c' column (expect writeFpIndex layout)"))
    require(!newDocs.columns.contains("__graft_new"),
      "Winnow: input already has a '__graft_new' column — rename it first")
    val idx = validatedFpIndex(fpIndex, k, w)
    // materialized once (the dupCandidates idiom): the batch-side viral
    // gate and the probe join both consume it
    val probe = fingerprints(newDocs, k, w, idCol, textCol)
      .withColumnRenamed(idCol, "__graft_new").localCheckpoint(eager = false)
    val batchViral = probe.groupBy(col("fp"))
      .agg(count(lit(1)).as("__bdf")).filter(col("__bdf") > maxDocFreq)
      .select("fp")
    // doc-frequency gate computed ON the bucketed layout: groupBy(fp) reuses
    // the storage partitioning, and the anti-join against it matches that
    // same partitioning — the whole index leg plans exchange-free
    val viral = idx.groupBy(col("fp"))
      .agg(count(lit(1)).as("__df")).filter(col("__df") > maxDocFreq)
      .select("fp")
    val hits = idx.join(viral, Seq("fp"), "left_anti")
      .join(probe.join(batchViral, Seq("fp"), "left_anti"), Seq("fp"))
      .groupBy(col("__graft_new"), col("id"))
      .agg(count(lit(1)).as("__shared"))
      .filter(col("__shared") >= minShared)
      .select(col("__graft_new")).distinct()
    newDocs.join(hits, newDocs(idCol) === col("__graft_new"), "left_anti")
  }

  /** Candidate document pairs sharing at least `minShared` fingerprints —
    * the MOSS pairing. Fingerprints more common than `maxDocFreq` are
    * dropped FIRST (standard winnowing practice: viral boilerplate would
    * otherwise contribute O(n²) pairs for one fingerprint — the same
    * hot-key discipline as the LSH band joins). Pair generation is a
    * fingerprint equi-join of slim (id, fp) rows; never a cross join.
    *
    * Threshold semantics: the w+k-1 guarantee promises exactly ONE shared
    * fingerprint, so only `minShared = 1` (the default) honors it.
    * Raising `minShared` demands a proportionally longer overlap — m
    * disjoint full windows (a shared run of ≥ m·w + k - 1 tokens)
    * guarantee m DISTINCT shared fingerprints, since disjoint windows
    * select different grams; anything shorter clears a higher threshold
    * only probabilistically.
    */
  def dupCandidates(docs: DataFrame, k: Int = 5, w: Int = 4,
                    minShared: Int = 1, maxDocFreq: Int = 1000,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(minShared > 0 && maxDocFreq > 1,
      s"Winnow: minShared=$minShared must be positive and maxDocFreq=$maxDocFreq > 1")
    // materialize the fingerprint pipeline ONCE (lazy local checkpoint —
    // the established Tfidf/Clusters idiom): the doc-frequency aggregate
    // and BOTH self-join branches consume it, and Catalyst would otherwise
    // duplicate the window+aggregate subtree per consumer. The aggregate
    // (not a count-over-fp window) keeps the doc-frequency computation
    // skew-safe: partial map-side combine, no viral-fp hot partition.
    val fps = fingerprints(docs, k, w, idCol, textCol).localCheckpoint(eager = false)
    val keep = fps.groupBy(col("fp")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs").between(2, maxDocFreq)) // singletons pair with nothing
      .select("fp")
    val gated = fps.join(keep, Seq("fp"), "left_semi")
    val a = gated.select(col("fp"), col(idCol).as("id_a"))
    val b = gated.select(col("fp"), col(idCol).as("id_b"))
    a.join(b, Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
