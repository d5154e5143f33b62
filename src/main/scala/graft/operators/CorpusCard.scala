package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Persisted, MERGEABLE corpus data cards — the datasheet-maintenance shape
  * for a rolling 100 TB corpus: each ingest slice (a day, a shard, a crawl
  * segment) reduces once to constant-size per-group sketch state, the state
  * lands in parquet next to the slice, and the corpus-wide card at any
  * moment is a union of the stored states — day N's card never rescans
  * days 1..N−1 (the same never-rescan-the-corpus rule as
  * [[Dedup.exactIncremental]] and the band-indexed minhash).
  *
  * Every column of the day state is chosen for exact or bounded
  * mergeability:
  *  - `n_docs`, `total_tokens`: long sums — exactly mergeable.
  *  - `quality_sum`: DECIMAL(28,6) sum of the per-doc DECIMAL(18,6) quality
  *    scores (the money-sum discipline: exact and order-free, so a merged
  *    average is bit-equal to the whole-corpus average).
  *  - `chars_hist`: fixed-width bucket counts as `(bucket, n)` rows packed
  *    into a map — an EXACTLY mergeable histogram; any percentile then
  *    reads off the merged histogram with error bounded by one bucket
  *    width (`bucketWidth`, default 50 chars — the q_hist_chars
  *    resolution). `approx_percentile`'s quantile sketch is mergeable
  *    in-flight but has no public serialized form to persist; the
  *    histogram is the storable equivalent with an explicit, tunable
  *    bound.
  *  - `text_hll`: a Datasketches HLL sketch of the md5 content hashes
  *    (`hll_sketch_agg`) — the industry-standard mergeable distinct
  *    counter, persistable as binary and unioned with `hll_union_agg`.
  *    Estimate error ≈ 1.04/√2^lgConfigK (~1.6% at the default 12).
  *
  * Reference: staticql's derived-content cards aggregate per collection at
  * build time (src/indexer.ts); this is that idea rebuilt for a corpus
  * whose history cannot be rescanned.
  */
object CorpusCard {

  /** Reduce one ingest slice to its per-`groupCol` mergeable state:
    * `(groupCol, n_docs, total_tokens, quality_sum, chars_hist, text_hll)`.
    * ONE scan, ONE partial-aggregating exchange on the group key — token
    * counts, decimal sums, histogram entries and the HLL all combine
    * map-side. Write the result next to the slice (plain parquet; the HLL
    * is a binary column) and never touch the slice again. `charsCol` must
    * be non-null (it buckets the histogram key — the same contract the
    * exact card's percentile places on it).
    */
  def sketchSlice(docs: DataFrame, groupCol: String = "lang",
                  textCol: String = "text", charsCol: String = "n_chars",
                  bucketWidth: Int = 50, lgConfigK: Int = 12): DataFrame = {
    require(docs.columns.contains(groupCol),
      s"CorpusCard.sketchSlice: input has no '$groupCol' column")
    sketchKeyed(docs, Seq(col(groupCol)), Seq(groupCol),
      textCol, charsCol, bucketWidth, lgConfigK)
  }

  /** Every slice's [[sketchSlice]] state in ONE corpus pass, for when the
    * slices live in the same table (a backfill over history, or a bench
    * simulating days out of one static table): `sliceExpr` joins the group
    * key, so one scan + one exchange produce one state row per
    * (slice, group) — row-identical to filtering per slice and unioning the
    * per-slice [[sketchSlice]] outputs, because every state column reduces
    * per (slice, group) either way (sums/histogram/HLL are order-free).
    * CAVEAT (the one asymmetry vs a filter union): groupBy is TOTAL over
    * `sliceExpr` — rows whose slice value a filter enumeration would never
    * match (NULL, a negative remainder) still form a slice here and flow
    * into the merged card. A caller replicating an explicit enumeration
    * must pre-filter to its domain (q_corpus_card_daily filters
    * `(doc_id % 3).isin(0,1,2)`). The
    * slice id is dropped from the result: [[merge]] consumes states row-wise
    * regardless of origin, exactly as it consumes a union. The PRODUCTION
    * rolling shape (day N arrives alone, reduces alone, history never
    * rescanned) keeps calling [[sketchSlice]] per arriving slice — this
    * helper exists so a backfill over co-resident slices does not pay one
    * full corpus scan per slice (r21: q_corpus_card_daily, 3 scans → 1).
    */
  def sketchSlicesOnePass(docs: DataFrame, sliceExpr: org.apache.spark.sql.Column,
                          groupCol: String = "lang",
                          textCol: String = "text", charsCol: String = "n_chars",
                          bucketWidth: Int = 50, lgConfigK: Int = 12): DataFrame = {
    require(docs.columns.contains(groupCol),
      s"CorpusCard.sketchSlicesOnePass: input has no '$groupCol' column")
    // the slice key aliases "__graft_slice" and is dropped by that name: a
    // pre-existing column (or groupCol) of that name would make the groupBy
    // ambiguous / the drop remove the wrong column (r21 ADVICE)
    require(!docs.columns.contains("__graft_slice") && groupCol != "__graft_slice",
      "CorpusCard.sketchSlicesOnePass: input already has a '__graft_slice' column — rename it first")
    sketchKeyed(docs, Seq(sliceExpr.as("__graft_slice"), col(groupCol)),
        Seq("__graft_slice", groupCol), textCol, charsCol, bucketWidth, lgConfigK)
      .drop("__graft_slice")
  }

  private def sketchKeyed(docs: DataFrame, keys: Seq[org.apache.spark.sql.Column],
                          keyNames: Seq[String],
                          textCol: String, charsCol: String,
                          bucketWidth: Int, lgConfigK: Int): DataFrame = {
    require(bucketWidth > 0, s"CorpusCard: bucketWidth=$bucketWidth must be positive")
    // neutral prefix: both sketchSlice and sketchSlicesOnePass land here, so
    // the message must not name one entry point (r21 ADVICE)
    Seq(textCol, charsCol).foreach(c => require(docs.columns.contains(c),
      s"CorpusCard: input has no '$c' column"))
    val bucket = (col(charsCol) / bucketWidth).cast("int")
    docs
      .groupBy(keys :+ bucket.as("__bucket"): _*)
      .agg(
        count(lit(1)).as("__n"),
        sum(TextFunctions.tokenCount(col(textCol)).cast("long")).as("__tok"),
        sum(TextFunctions.qualityScore(col(textCol)).cast("decimal(18,6)"))
          .as("__q"),
        hll_sketch_agg(md5(col(textCol)), lit(lgConfigK)).as("__hll"))
      // second, group-level combine: bucket-count rows fold into the map,
      // the per-bucket partial sums/sketches union up. Both aggregates
      // are partial-combining; the exchange carries (group × buckets)
      // sketch-width rows, never documents.
      .groupBy(keyNames.map(col): _*)
      .agg(
        sum("__n").as("n_docs"),
        sum("__tok").as("total_tokens"),
        sum("__q").cast("decimal(28,6)").as("quality_sum"),
        map_from_entries(array_sort(collect_list(
          struct(col("__bucket"), col("__n"))))).as("chars_hist"),
        hll_union_agg(col("__hll")).as("text_hll"))
  }

  /** Union day states into one state of the same schema — the operation a
    * rolling card runs nightly over `spark.read.parquet(days...)`. Exact
    * columns add; histograms add bucket-wise; HLLs union. Output is again
    * a valid input to `merge` (associative, so weekly/monthly rollups
    * compose).
    */
  def merge(states: DataFrame, groupCol: String = "lang"): DataFrame = {
    // ONE pass over the state rows — load-bearing when the states are
    // derived plans rather than parquet reads (a two-branch
    // scalars-join-histogram formulation re-evaluates the whole upstream
    // subtree per branch; the plan audit caught it doubling the corpus
    // scans). Exploding the histogram multiplies each state row by its
    // bucket count, so scalar/sketch columns ride ONLY the pos-0 entry
    // (posexplode_outer keeps empty-histogram states as one NULL-pos row —
    // their scalars still count; their NULL bucket never enters the map).
    val ex = states.select(col(groupCol),
      col("n_docs"), col("total_tokens"), col("quality_sum"), col("text_hll"),
      posexplode_outer(map_entries(col("chars_hist"))).as(Seq("__p", "__e")))
    val firstRow = col("__p").isNull || col("__p") === 0
    ex
      .groupBy(col(groupCol), col("__e.key").as("__bucket"))
      .agg(sum(col("__e.value")).as("__bn"),
        sum(when(firstRow, col("n_docs"))).as("__nd"),
        sum(when(firstRow, col("total_tokens"))).as("__tt"),
        sum(when(firstRow, col("quality_sum"))).as("__qs"),
        hll_union_agg(when(firstRow, col("text_hll"))).as("__hl"))
      .groupBy(col(groupCol))
      .agg(sum("__nd").as("n_docs"), sum("__tt").as("total_tokens"),
        sum("__qs").cast("decimal(28,6)").as("quality_sum"),
        map_from_entries(array_sort(collect_list(when(col("__bucket").isNotNull,
          struct(col("__bucket"), col("__bn")))))).as("chars_hist"),
        hll_union_agg(col("__hl")).as("text_hll"))
  }

  /** Finish a state into the human-readable card:
    * `(groupCol, n_docs, total_tokens, avg_quality, p50_chars_est,
    * n_unique_approx)`. `avg_quality` is exact (decimal sum / exact
    * count); `p50_chars_est` is the midpoint of the bucket holding the
    * median (error ≤ bucketWidth); `n_unique_approx` is the HLL estimate.
    */
  def finish(state: DataFrame, groupCol: String = "lang",
             bucketWidth: Int = 50): DataFrame = {
    val entries = map_entries(col("chars_hist"))
    // running bucket counts: the median bucket is the first whose running
    // sum reaches n_docs/2 — computed columnar over the (small) map.
    val target = ceil(col("n_docs") / 2)
    val buckets = filter(
      transform(entries, (e, i) =>
        struct(e.getField("key").as("b"),
          aggregate(slice(entries, lit(1), i + 1), lit(0L),
            (acc, x) => acc + x.getField("value")).as("run"))),
      s => s.getField("run") >= target)
    state.select(
      col(groupCol),
      col("n_docs"),
      col("total_tokens"),
      // decimal→double BEFORE the divide — the exact card's arithmetic
      // (q_corpus_card), so a merged avg is bit-equal to the one-shot avg
      round(col("quality_sum").cast("double") / col("n_docs"), 4).as("avg_quality"),
      (element_at(buckets, 1).getField("b") * bucketWidth + bucketWidth / 2)
        .cast("long").as("p50_chars_est"),
      hll_sketch_estimate(col("text_hll")).as("n_unique_approx"))
  }
}
