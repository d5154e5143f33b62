package graft

import java.nio.file.{Files, Paths}

/** Plan auditor: dumps `explain("formatted")` for representative queries and
  * greps the properties that matter at 100 TB (pushdown, broadcast, codegen,
  * partition pruning) → PLANS.md. Run: `sbt "runMain graft.Plans <sfDir>"`.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = Tables.harnessSession()

    val audit = Seq(
      "q_filter_eq"        -> "filter must reach the scan as PushedFilters",
      "q_peek"             -> "ReadSchema must contain only slug+order columns",
      "q_page_after"       -> "keyset predicate pushed; TakeOrderedAndProject not global sort",
      "q_join_belongsto"   -> "customer side broadcast (BroadcastHashJoin)",
      "q_join_hasmanythrough" -> "both hops broadcast; no shuffle of the fact side",
      "q_join_hasmany"     -> "TopNThroughRiJoin: the top-500 (sort keys substituted through the FK equi pair) is computed on the orders side FIRST — TakeOrderedAndProject BELOW the join, 500-row side as the broadcast build; the pre-rule plan joined the full fact table then took 500 rows",
      "q_join_nested_hasmany" -> "CollectSizeToCount: NO collect_list anywhere — the nested size() consumes count(o_orderkey), a partial-aggregating HashAggregate (one long per group through the exchange, never the array); the coalesce-to-0 left-outer attach shape rewrites with it",
      "q_page_join"        -> "cursor page over a belongsTo join: keyset predicate pushed to the orders scan (PushedFilters) AND the top-20 computed on the orders side below the join (TopNThroughRiJoin) — page cost stays O(page) at any dimension size",
      "q_agg_pricing"      -> "partial_ aggregation before the exchange (map-side combine)",
      "q_agg_topcust"      -> "shuffle agg on o_custkey then broadcast dim join",
      "q_dedup_exact"      -> "hash shuffles, not text bodies: project before exchange",
      "q_dedup_corpus"     -> "ONE body-width hashpartitioning(sha2) exchange feeding the first-occurrence window — no join operator, no second scan (the aggregate+semi-join form double-scans AND ships bodies through its SortMergeJoin exchange once the winner set outgrows broadcast range; see Dedup.exactCorpusOnePass)",
      "q_html_extract"     -> "pure scan projection: exactly ONE native HtmlTextExtract node (strip/segment/score/rejoin in one pass; subexpression elimination must dedup the three field extractions), zero shuffles beyond the output sort",
      "q_pipeline_html"    -> "the whole page→blocks→line-rules front is ONE codegen'd projection over ONE scan (one HtmlTextExtract node, one FilterLines node, no intermediate exchange); the only shuffles are the dedup window's content-hash exchange and the output sort — no join operator anywhere",
      "q_events_funnel"    -> "ONE scan, ONE hashpartitioning(user_id) exchange: both funnel stages are conditional min aggregates in the SAME aggregate (the textbook two-filtered-aggregates + join form scanned events twice and shuffled three times — r14's worst initial sf10 ratio)",
      "q_dedup_minhash"    -> "per-row signature in one WholeStageCodegen span",
      "q_index_diff"       -> "both snapshots pre-aggregate to (slug, values) before the full-outer join — index-width shuffle only, no document bodies",
      "q_pipeline_corpus"  -> "gates fuse into the scans (native text expressions inside codegen); only (hash, min id) aggregates shuffle, bodies never move",
      "q_text_langid"      -> "single codegen'd scan, marker counts in one pass, no shuffle before the final sort",
      "q_ann_bruteforce"   -> "single scan + TakeOrderedAndProject, no global sort",
      "q_ann_batch"        -> "fused retrieval (FusedTopK): the scoring loop runs inside ONE mapPartitions pass (ExistingRDD of per-partition winners) — no BroadcastNestedLoopJoin, no per-pair row materialization; the ONLY exchange is the bounded top-k merge, then the rank window on ≤ queries×k rows",
      "q_agg_cube"         -> "PreAggregateGroupingSets FORCED through its size gate (this query lifts it for its own planning window): scan → finest-grain aggregate → Expand over ≤15 rows → set aggregate — the 600M-row×4-set Expand never exists at any scale",
      "q_events_window"    -> "partial agg on date_trunc before exchange",
      "q_window_rank"      -> "single window exchange on o_custkey",
      "q_sessionize"       -> "one shuffle on user_id for both lag and sum windows",
      "q_asof_join"        -> "ONE hashpartitioning exchange on the as-of key feeding the running-last window; no inequality join, no cartesian",
      "q_asof_bucketed"    -> "window partitioned by (key, time bucket) — hot-key timelines split across buckets; right rows replicated by ONE Generate (explode of [b, b+1]; a self-union would re-evaluate the right subtree), narrow columns only; tieBreak dedup rides the window sort — exactly ONE hashpartitioning exchange, TWO scans (left+right), ONE Generate",
      "q_range_join"       -> "equi-join on (key, bucket) with the range predicate as a post-join filter — SortMergeJoin/ShuffledHashJoin, never BroadcastNestedLoopJoin",
      "q_range_agg"        -> "join-free: union of two filtered scans feeds ONE hashpartitioning(user_id) exchange for the RANGE-frame window; no join operator anywhere in the plan",
      "q_agg_rollup"       -> "Expand BEFORE partial_ aggregation — grouping-set rows still combine map-side. At sf0.01 PreAggregateGroupingSets stays OFF by its 128 MB input gate (an extra stage cannot pay here); above it the plan becomes scan → finest-grain aggregate → Expand over ≤6 rows → set aggregate (sf100: 14.3 → 6.2 s, plan + parity pinned in GroupingSetRulesSpec)",
      "q_agg_quantiles"    -> "partial_percentile before the exchange (percentile buffers merge map-side)",
      "q_anti_join"        -> "LeftAnti join; status filter pushed to the orders scan (PushedFilters); presentation sort is a PARALLEL range sort over the checkpointed join output (no 1-partition exchange, no range-sampler re-execution of the join)",
      "q_anti_join_sorted" -> "LeftAnti join over the key-sorted layout with a distinct-first build — disjoint per-task key ranges collapse the partial distinct map-side, so the build exchange carries ~unique keys instead of every F-status row; parallel checkpointed presentation sort",
      "q_agg_topcust_sorted" -> "aggregate over the key-sorted layout: partial aggregate combines to ~final groups (disjoint per-task o_custkey ranges), the exchange carries ~1/9 the rows; top-10 broadcast back against the dim",
      "q_agg_pricing_sorted" -> "the Q1 aggregate over the group-key-sorted 16 MB-row-group layout: same plan as q_agg_pricing but the partial aggregate sees collated groups and the scan reads RLE'd keys (−26% clean-session at sf100, 1.90× DuckDB vs 2.52× raw)",
      "q_agg_rollup_sorted"  -> "rollup over the group-key-sorted layout with the NDV license redeclared onto the copy — PreAggregateGroupingSets must stay ON over the rewritten scan (it silently switched off in r19: +37%; licensed it reads −35%, 1.69×); gate behavior as q_agg_rollup",
      "q_sessionize_bucketed" -> "sessionize over user-bucketed, bucket-sorted (single-file-per-bucket) events: scan → window → window → aggregate with ZERO exchanges and ZERO sorts — the scan's hashpartitioning + (user_id, ts) ordering satisfy every requirement (PlanPropertiesSpec pin; 3.05 s vs raw 7.67 s at sf100, 1.06× DuckDB)",
      "q_ann_ivf_probe"    -> "the production IVF point (nprobe=2 of nlist=8): identical plan shape to q_ann_ivf — probe pairs + query vectors broadcast, ONE native NearestCenter assignment inside the scan, bounded top-k aggregate — with the candidate stream cut to the 2 probed cells per query",
      "q_zorder_pruned"    -> "scan of the writeZOrdered layout with BOTH range predicates pushed (PushedFilters on l_partkey AND l_suppkey) — Morton-clustered 8 MB row groups let the parquet zone maps skip the ~94% of tiles the probe cannot touch (numOutputRows pin: LayoutSpec); aggregate is partial before the tiny exchange",
      "q_embed_centroid"   -> "per-row native fold reductions inside the scan projection; only (label, 2 decimals) shuffle",
      "q_text_repetition"  -> "ONE RepetitionStats node (field extraction must not inline the tokenizing expression per output column); no shuffle before the final sort",
      "q_sample_split"     -> "pure scan projection — md5-prefix CASE inside the scan, zero shuffles beyond the output sort",
      "q_pack_sequences"   -> "ONE hashpartitioning(shard) exchange feeding the running-sum window; only (doc_id, tokens) width shuffles, bodies stay in the scan",
      "q_token_budget"     -> "ONE hashpartitioning(source) exchange; native quality+token expressions evaluate inside the scan projection, only (id, source, score, tokens) widths shuffle",
      "q_decontaminate"    -> "benchmark gram set BROADCAST (BroadcastHashJoin left_semi on the gram stream) — corpus grams probe map-side, never shuffle; final anti-join right side is the small contaminated-id set",
      "q_pii_redact"       -> "pure scan projection: ONE PiiStats node (counts + redaction fused; field extraction must not inline it per column), zero shuffles beyond the output sort",
      "q_mix_sources"      -> "pure scan projection — per-source md5 CASE inside the scan, zero shuffles beyond the output sort",
      "q_text_chunks"      -> "tokenize → sequence → posexplode(Generate) → slice, all inside the scan stage; NO exchange anywhere before the output sort",
      "q_line_dedup"       -> "TWO linear exchanges only: hashpartitioning(line) for the first-occurrence window, then hashpartitioning(doc_id) for reassembly — no join operator anywhere; loser rows ship a NULLed line string into the reassembly exchange (content only rides for winners)",
      "q_line_filter"      -> "ZERO shuffles, zero Generate, and exactly ONE native FilterLines node evaluated once (subexpression elimination must dedup the three field extractions): split→rules→rejoin is a single byte pass inside the scan projection — no explode, no aggregate, no per-line interpreted lambda (the r13 HOF form paid 2.1x at sf0.1 in lambda dispatch; the r12 explode+reassembly form paid 25 s at sf10 in shuffle), no exchange before the output sort",
      "q_text_normalize"   -> "pure scan projection: UnicodeNormalize + lower + regexp inside the scan, zero shuffles beyond the output sort",
      "q_dedup_exact_inc"  -> "corpus side map-side only (bloom agg subquery + broadcast semi-join probe); BroadcastHashJoins for the candidate check; the ONLY full exchange is the new batch's window on its content hash",
      "q_ann_batch"        -> "queries BROADCAST once, corpus scanned ONCE for all queries, candidates discarded MAP-SIDE by the bounded top-k aggregate (ObjectHashAggregate partial keeps ≤ k per query per partition — the exchange carries the answer, not the candidates)",
      "q_pipeline_ingest"  -> "normalize fuses into the scan; the whole normalize→line-dedup→exact-dedup chain is ONE plan evaluated ONCE: line window exchange, reassembly exchange, then ONE content-hash window exchange for the dedup (the join form re-ran the whole upstream chain twice — exactly one hashpartitioning(__graft_line) may appear)",
      "q_ann_ivf"          -> "probe pairs + query vectors both BROADCAST to the corpus (each query vector ships ONCE, not once per probe cell); cell assignment is ONE native NearestCenter node inside the scan (no MLlib, no array cast — the quantizer trained driver-local on the bounded sample); candidates discarded map-side by the bounded top-k aggregate",
      "q_text_winnow"      -> "the ENTIRE fingerprint pass is one native WinnowFps node inside the scan (tokenize → md5 k-grams → sliding-min → distinct per document) — ZERO exchanges before the output sort; no k-gram ever becomes a row",
      "q_text_tfidf"       -> "tf triples computed INSIDE the scan (native TermCounts — no token occurrence ever shuffles), checkpointed once; remaining exchanges are the vocabulary-sized df aggregate and the term join only",
      "q_text_bm25"        -> "postings from the scan-side TermCounts filtered to the query's terms BEFORE anything shuffles; N+avgdl ride ONE struct-typed scalar subquery (one corpus pass, no second tokenize); per-term weights sum as decimal — exchanges are the ≤|query|-key df aggregate, the term join, and the per-doc score aggregate",
      "q_dedup_semantic"   -> "candidates from the (cell, bucket) equi-join — never a cell cross-product; cosine scores in the join's output projection and the threshold filter runs BEFORE the dedup exchange, so only narrow (id_a, id_b, score) rows ever shuffle, vectors move only with their own corpus row",
      "q_text_bpe"         -> "pure scan projection: ONE native bpeishcount node (a state machine, not a regex) inside the scan, zero shuffles beyond the output sort",
      "q_text_perplexity"  -> "scoring is ONE native BigramPpl scan node (the model ships inside the expression with log-probs pre-rounded to decimal micros) — NO join, NO aggregate, NO exchange in the scoring half beyond the output sort; training's exchanges are vocabulary-sized aggregates (native TermCounts/BigramCounts partials — document bodies never ride any exchange)",
      "q_ann_negatives"    -> "anchors broadcast ONCE with vector + label; the label exclusion sits in the join condition BELOW the bounded top-k aggregate (k always fills), candidates discarded map-side — the exchange carries ≤ partitions × anchors × k rows",
      "q_embed_quantize"   -> "pure scan projection: ONE native Int8Quantize node (scale + codes in a single pass) inside the scan, zero shuffles beyond the output sort",
      "q_embed_assign"     -> "pure scan projection: ONE native NearestCenter node (all centroids in one pass, centers shipped as a plan literal) inside the scan, zero shuffles beyond the output sort",
      "q_corpus_card"      -> "ONE scan, ONE partial-aggregating exchange on lang: token counts, decimal quality sums, percentile buffer and distinct-md5 all combine map-side in the same aggregate",
      "q_corpus_card_approx" -> "same single scan + ONE partial-aggregating exchange as the exact card, but NO second dedup exchange (exact countDistinct expands to one) — approx_count_distinct's HLL++ and approx_percentile's quantile sketch are mergeable partial state, O(sketch) per group instead of O(rows)",
      "q_corpus_card_daily" -> "each day-slice reduces in ONE scan + partial-aggregating exchanges to card-sized state (sums/histogram/HLL all combine map-side; documents never ride an exchange); merge is a SINGLE pass over the states — no join, and each day subtree evaluates exactly once (scalars ride only the pos-0 histogram entry)",
      "q_pipeline_curate"  -> "one-pass native BigramPpl scoring (no model joins, no score aggregate) feeding ONE lang-partitioned window exchange for percent_rank — the bucket gate never re-scans the corpus",
      "q_quality_classifier" -> "pure scan projection: ONE native HashedNgramLogit node (the model's weight table rides the expression into every task; grams never become rows), zero shuffles beyond the output sort",
      "q_embed_pq"         -> "pure scan projection: ONE native PqEncode node (all subspace codebooks in one pass, shipped as a codegen reference object), zero shuffles beyond the output sort",
      "q_text_bm25_indexed" -> "term filter prunes the stored buckets (bucket pruning in the scan); df aggregate + posting join consume the stored term-partitioning with NO exchange — the only shuffle is the per-document score aggregate over slim scored rows",
      "q_ann_ivf_stored"   -> "stored cell-bucketed corpus read through the bucketing-aware scan; probe pairs + query tables broadcast; candidates discarded map-side by the bounded top-k aggregate — plus the degenerate-layout guard: when nlist < session cores, ONE round-robin exchange of the narrow assignment precedes the probe join (a cell-bucketed scan has ≤ nlist non-empty partitions; without the exchange the whole scoring stage runs on nlist cores — sf10 measured 100.8 s vs 19.2 s)",
      "q_ann_adc"          -> "PQ codes from ONE native PqEncode scan; per-query distance tables computed on the BROADCAST side (PqDistTable — m·ksub·dsub flops per query, not per doc); corpus rows pay m AdcDistance lookups, candidates discarded map-side by the bounded top-k aggregate",
      "q_sample_clusters"  -> "cell assignment is ONE native NearestCenter node inside the scan; the only exchange beyond the output sort is the cell-partitioned sampling window (WindowGroupLimit prunes to n per cell map-side)",
      "q_dedup_substr"     -> "gram stream from ONE native KgramHashes node inside the scan; the dup-count aggregate exchanges 8-byte hashes ONLY (project before exchange — bodies never move), flags return via semi-join of narrow (doc, pos, h) rows; span merge is one doc-partitioned window",
      "q_split_leakage"    -> "the duplicate-pair graph resolves on the ADAPTIVE CC path: one bounded CollectLimit probe job over the equi-join edge plan (no inequality join), then the RESULT plan is ONE distinct exchange over node ids + ONE BroadcastHashJoin against the driver-resolved component mapping (LocalTableScan) — ZERO fixpoint rounds, no checkpointed loop; past the 200k-edge threshold the probe stops early and the O(log diameter) pointer-jumping loop takes over; the split CASE is pure column algebra over the component"
    )

    val sb = new StringBuilder
    sb.append("# PLANS — physical-plan audit (generated by graft.Plans)\n\n")
    sb.append(s"Scale dir: `$sfDir`. For each headline query: the property that has to\n")
    sb.append("hold for the plan to survive a 100 TB scale-up, then the formatted plan.\n\n")

    // Non-query component plans: the bulk index-maintenance rebuild
    // (operators/Indexing.updateIndexFromDiff) has no SparkEntry row — its
    // output is a partition swap, not a result set — but its plan carries
    // 100 TB obligations of its own, so audit it on a documents-backed
    // index + a synthetic 20%-churn diff.
    val componentAudit: Seq[(String, String, () => org.apache.spark.sql.DataFrame)] = Seq(
      ("index_bulk_rebuild",
       "the diff is never collected: new rows derive by distributed explode (Generate), departing slugs leave via a left-anti JOIN on the slug frame — NO `isin` literal list anywhere (nothing on the driver scales with change volume); touched partitions gate both branches as broadcast semi-joins",
       () => {
         import org.apache.spark.sql.functions._
         val docs = Tables.load(spark, sfDir, "documents")
           .select(col("doc_id").cast("string").as("slug"), col("lang"), col("source"))
         val idxPath = Files.createTempDirectory("graft-plan-idx").toString
         graft.operators.Indexing.writeIndex(docs, "slug", Seq("lang", "source"), idxPath)
         val v2 = docs.withColumn("lang",
           when(col("slug").cast("long") % 5 === 0, concat(col("lang"), lit("x")))
             .otherwise(col("lang")))
         val diff = graft.operators.Indexing.extractDiff(docs, v2, "slug", Seq("lang", "source"))
         graft.operators.Indexing.bulkRebuilt(spark, idxPath, diff, Seq("lang", "source"), _ => 1)._1
       })
    )

    def appendPlan(name: String, property: String,
                   df: org.apache.spark.sql.DataFrame): Unit = {
      val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        .linesIterator
        .map(l => if (l.length > 300) l.take(300) + " …" else l)
        .mkString("\n")
      sb.append(s"## $name\n\n**Must hold:** $property\n\n```\n")
      sb.append(plan.take(6000))
      sb.append("\n```\n\n")
    }

    // (appendPlan truncates per LINE before the overall budget: a plan
    // literal, e.g. q_embed_assign's 8×64 centroid array, is one huge line
    // that would otherwise eat the whole take() and cut off the
    // Exchange/Sort nodes the must-hold property is about.)
    audit.foreach { case (name, property) =>
      appendPlan(name, property, SparkEntry.queries(name)(spark, sfDir))
    }
    componentAudit.foreach { case (name, property, mk) =>
      appendPlan(name, property, mk())
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"[plans] wrote PLANS.md (${audit.size + componentAudit.size} plans)")
    spark.stop()
  }
}
