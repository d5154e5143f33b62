package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Diagnostic main: run named SparkEntry queries once (noop write, warm
  * session) and print per-query Spark JOB and STAGE counts plus wall time —
  * the decomposition evidence behind BASELINE.md's low-end job-floor
  * arguments (a 2-second query that is 4 jobs of launch floor needs a
  * different fix than a 2-second query that is one slow stage).
  *
  * Usage: runMain graft.PlanDiag <sfDir> <query>[,<query>...]
  */
object PlanDiag {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args
    val spark = Tables.harnessSessionFor(sfDir)
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = { stages.incrementAndGet(); () }
    })
    // experimental plan variants measured against registered queries before
    // deciding a rewrite (kept here, out of the SparkEntry contract)
    val experiments: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
      "x_corpus_window" -> ((s, dir) =>
        operators.Dedup.exactCorpusOnePass(Tables.load(s, dir, "documents"))
          .select("doc_id", "lang", "n_chars").orderBy("doc_id")),
      // q_asof_bucketed decomposition: input-scan floor and no-final-sort
      "x_asof_scan" -> ((s, dir) => {
        import org.apache.spark.sql.functions._
        val ev = Tables.load(s, dir, "events")
        ev.filter(col("event_type") === "purchase").select("event_id", "user_id", "ts")
          .unionByName(ev.filter(col("event_type") === "view")
            .select(col("event_id"), col("user_id"), col("ts")))
      }),
      "x_asof_noorder" -> ((s, dir) => {
        import org.apache.spark.sql.functions._
        val ev = Tables.load(s, dir, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id").as("v_user"), col("ts").as("vts"),
            col("event_id").as("view_id"))
        operators.AsOf.asOfJoinBucketed(purchases, views, "user_id", "v_user", "ts", "vts",
            payload = Seq("view_id"), toleranceMillis = 3600_000L, bucketMillis = 3600_000L,
            tieBreak = Some("view_id"))
          .select(col("event_id"), col("view_id").as("asof_view_id"))
      }),
      // q_dedup_semantic decomposition: quantizer fit+assign only
      "x_sem_fit" -> ((s, dir) => {
        import org.apache.spark.sql.functions._
        val emb = Tables.load(s, dir, "embeddings")
        val aug = emb.unionByName(
          emb.filter(col("vec_id") % 50 === 0)
            .withColumn("vec_id", col("vec_id") + 1000000000L))
        val n = emb.count()
        val nlist = operators.Similarity.nlistFor(n + n / 50)
        operators.Similarity.ivfIndex(aug, nlist).assigned.select("vec_id", "cell")
      }),
      // q_line_dedup decomposition: explode-only, then explode+window-mark
      "x_ld_explode" -> ((s, dir) => {
        import org.apache.spark.sql.functions._
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            regexp_replace(col("text"), "(\\S+\\s+\\S+)\\s+", "$1\n").as("text"))
          .select(col("doc_id"), posexplode_outer(split(col("text"), "\n")))
      }),
      "x_ld_window" -> ((s, dir) => {
        import org.apache.spark.sql.functions._
        import org.apache.spark.sql.expressions.Window
        val lines = Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            regexp_replace(col("text"), "(\\S+\\s+\\S+)\\s+", "$1\n").as("text"))
          .select(col("doc_id"), posexplode_outer(split(col("text"), "\n")).as(Seq("ord", "line")))
        val w = Window.partitionBy(col("line")).orderBy(col("doc_id"), col("ord"))
        lines.withColumn("keep", row_number().over(w) === 1)
      }),
      // q_agg_pricing with PLAIN double sums — the scan+groupby floor a
      // money-exact aggregate cannot beat (A/B for Decimal128's constant)
      "x_pricing_double" -> ((s, dir) => {
        import org.apache.spark.sql.functions._
        Tables.load(s, dir, "lineitem")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(sum(col("l_quantity")).as("sum_qty"),
               sum(col("l_extendedprice")).as("sum_base_price"),
               sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
               count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      }),
      // q_sessionize decomposition: the exchange+sort floor (no window
      // functions), then the window output without the final aggregate
      "x_sess_sort" -> ((s, dir) => {
        import org.apache.spark.sql.functions._
        Tables.load(s, dir, "events").select("user_id", "ts", "event_id")
          .repartition(col("user_id"))
          .sortWithinPartitions("user_id", "ts")
      }),
      "x_sess_window" -> ((s, dir) =>
        streaming.EventStreams.sessionize(Tables.load(s, dir, "events"))
          .select("user_id", "session_seq")),
      "x_sess_agg" -> ((s, dir) => {
        import org.apache.spark.sql.functions._
        streaming.EventStreams.sessionize(Tables.load(s, dir, "events"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"), max(col("session_seq")).as("n_sessions"))
      }),
      "x_sess_fastsort" -> ((s, dir) => {
        // materialization barrier before the presentation sort: the range
        // sampler re-reads one narrow exchange instead of re-running the
        // window pipeline
        import org.apache.spark.sql.functions._
        streaming.EventStreams.sessionize(Tables.load(s, dir, "events"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"), max(col("session_seq")).as("n_sessions"))
          .repartition(col("user_id"))
          .orderBy("user_id")
      }),
      "x_sess_sort1" -> ((s, dir) => {
        import org.apache.spark.sql.functions._
        streaming.EventStreams.sessionize(Tables.load(s, dir, "events"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"), max(col("session_seq")).as("n_sessions"))
          .repartition(1)
          .sortWithinPartitions("user_id")
      }),
      "x_sess_onewin" -> ((s, dir) => {
        // ONE window (lag) + per-user aggregate of the boundary flags —
        // the n_sessions a fused operator could emit without the running sum
        import org.apache.spark.sql.functions._
        import org.apache.spark.sql.expressions.Window
        val byUser = Window.partitionBy("user_id").orderBy("ts")
        Tables.load(s, dir, "events")
          .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
          .withColumn("new_session",
            when(col("prev_ts").isNull ||
              unix_millis(col("ts")) - unix_millis(col("prev_ts")) > 1800000L, 1L)
              .otherwise(0L))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"), sum(col("new_session")).as("n_sessions"))
      }),
      // q_corpus_card decomposition: base sums only, +percentile, +distinct
      "x_card_base" -> ((s, dir) => {
        import org.apache.spark.sql.functions._
        Tables.load(s, dir, "documents")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(functions.TextFunctions.tokenCount(col("text")).cast("long")).as("total_tokens"),
            round(plans.Decimal128.sumMoney(
                functions.TextFunctions.qualityScore(col("text")), 6) / count(col("text")), 4)
              .as("avg_quality"))
          .orderBy("lang")
      }),
      "x_card_pct" -> ((s, dir) => {
        import org.apache.spark.sql.functions._
        Tables.load(s, dir, "documents")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            round(expr("percentile(n_chars, 0.5D)"), 4).as("p50_chars"))
          .orderBy("lang")
      }),
      "x_card_distinct" -> ((s, dir) => {
        import org.apache.spark.sql.functions._
        Tables.load(s, dir, "documents")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(md5(col("text"))).as("n_unique"))
          .orderBy("lang")
      }),
      // q_agg_topcust decomposition: plain double sum (Decimal128 A/B),
      // and the aggregate without the top-k tail
      "x_topcust_double" -> ((s, dir) => {
        import org.apache.spark.sql.functions._
        val c = Tables.catalog(s, dir)
        val top = c("orders").df
          .groupBy("o_custkey")
          .agg(sum(col("o_totalprice")).as("revenue"), count(lit(1)).as("order_cnt"))
          .orderBy(desc("revenue"), col("o_custkey")).limit(10)
        broadcast(top).join(c("customer").df, col("o_custkey") === col("c_custkey"))
          .select("c_custkey", "c_name", "revenue", "order_cnt")
          .orderBy(desc("revenue"), col("c_custkey"))
      }),
      "x_topcust_aggonly" -> ((s, dir) => {
        import org.apache.spark.sql.functions._
        Tables.load(s, dir, "orders")
          .groupBy("o_custkey")
          .agg(plans.Decimal128.sumMoney(col("o_totalprice")).as("revenue"),
               count(lit(1)).as("order_cnt"))
      }),
      // corpus-card fine decomposition: pure text-scan floor, then each
      // per-doc native expression alone
      "x_docs_scan" -> ((s, dir) => {
        import org.apache.spark.sql.functions._
        Tables.load(s, dir, "documents").groupBy("lang")
          .agg(sum(length(col("text"))).as("chars")).orderBy("lang")
      }),
      "x_card_tokens" -> ((s, dir) => {
        import org.apache.spark.sql.functions._
        Tables.load(s, dir, "documents").groupBy("lang")
          .agg(sum(functions.TextFunctions.tokenCount(col("text")).cast("long"))
            .as("total_tokens")).orderBy("lang")
      }),
      "x_card_quality" -> ((s, dir) => {
        import org.apache.spark.sql.functions._
        Tables.load(s, dir, "documents").groupBy("lang")
          .agg(round(plans.Decimal128.sumMoney(
              functions.TextFunctions.qualityScore(col("text")), 6) / count(col("text")), 4)
            .as("avg_quality")).orderBy("lang")
      }),
      // corpus card with the distinct computed as a separate single-distinct
      // aggregate joined back (no Expand through the percentile agg)
      "x_card_joinform" -> ((s, dir) => {
        import org.apache.spark.sql.functions._
        val docs = Tables.load(s, dir, "documents")
        val base = docs.groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(functions.TextFunctions.tokenCount(col("text")).cast("long")).as("total_tokens"),
            round(plans.Decimal128.sumMoney(
                functions.TextFunctions.qualityScore(col("text")), 6) / count(col("text")), 4)
              .as("avg_quality"),
            round(expr("percentile(n_chars, 0.5D)"), 4).as("p50_chars"))
        val uniq = docs.groupBy("lang").agg(countDistinct(md5(col("text"))).as("n_unique"))
        base.join(uniq, Seq("lang")).orderBy("lang")
          .select("lang", "n_docs", "total_tokens", "avg_quality", "p50_chars", "n_unique")
      }),
      // q_agg_topcust: single post-exchange aggregate instead of
      // partial+exchange+final (high-NDV keys make the partial a no-op)
      "x_topcust_repart" -> ((s, dir) => {
        import org.apache.spark.sql.functions._
        Tables.load(s, dir, "orders").select("o_custkey", "o_totalprice")
          .repartition(col("o_custkey"))
          .groupBy("o_custkey")
          .agg(plans.Decimal128.sumMoney(col("o_totalprice")).as("revenue"),
               count(lit(1)).as("order_cnt"))
      }),
      // SQ8 prefilter diagnosis: candidate volume at the q_dedup_semantic
      // threshold (how many pairs does the quantization-error band admit?)
      "x_sem_sq8cand" -> ((s, dir) => {
        import org.apache.spark.sql.functions._
        val emb = Tables.load(s, dir, "embeddings")
        val aug = emb.unionByName(emb.filter(col("vec_id") % 50 === 0)
          .withColumn("vec_id", col("vec_id") + 1000000000L))
        val n = emb.count(); val nlist = operators.Similarity.nlistFor(n + n / 50)
        val index = operators.Similarity.ivfIndex(aug, nlist)
        val idx = index.assigned.withColumn("bucket",
          functions.VectorFunctions.hyperplaneBucket(col("embedding"), 64, 8, 7L))
        val replicated = idx
          .withColumn("__q", plans.VectorExpressions.quantize8(col("embedding")))
          .select(col("cell"), col("vec_id"),
            col("__q.scale").as("__scale"), col("__q.codes").as("__codes"),
            col("bucket").as("__obk"),
            explode(functions.VectorFunctions.probeBuckets(col("bucket"), 8)).as("bucket"))
          .withColumn("__orig", col("bucket") === col("__obk"))
        operators.FusedTopK.sq8PairCandidates(replicated, 0.999,
            "cell", "bucket", "__orig", "vec_id", "__scale", "__codes")
          .agg(count(lit(1)).as("n_candidates"),
               count_distinct(col("id_a"), col("id_b")).as("n_distinct"))
      }),
      // the layout lesson applied to the HIGH-NDV aggregate floor: orders
      // sorted by o_custkey (16 MB row groups) → each task sees disjoint
      // key ranges → the partial aggregate combines to ~final groups and
      // the exchange carries ~1.5M rows instead of ~13.7M
      "x_topcust_sorted" -> ((s, dir) => {
        import org.apache.spark.sql.functions._
        val p = s"/tmp/graft_x_topcust_sorted_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        // memoize on the _SUCCESS marker, not bare dir existence: an
        // interrupted earlier write leaves a partial dir that a bare
        // exists() would silently reuse
        if (!new java.io.File(p, "_SUCCESS").exists()) {
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
          operators.Layout.writeSorted(
            Tables.load(s, dir, "orders").select("o_custkey", "o_totalprice"),
            p, Seq("o_custkey"), rowGroupBytes = Some(16L << 20))
        }
        s.read.parquet(p)
          .groupBy("o_custkey")
          .agg(plans.Decimal128.sumMoney(col("o_totalprice")).as("revenue"),
               count(lit(1)).as("order_cnt"))
      }),
      // the exchange-free window: events bucketed by user_id → the
      // sessionize window's hash requirement is satisfied by the stored
      // layout, no exchange before the sort
      "x_sess_bucketed" -> ((s, dir) => {
        import org.apache.spark.sql.functions._
        val t = s"graft_x_events_bucketed_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        if (!s.catalog.tableExists(t))
          operators.Bucketing.writeBucketed(
            Tables.load(s, dir, "events").select("event_id", "user_id", "ts"),
            t, buckets = 32, Seq("user_id"))
        streaming.EventStreams.sessionize(operators.Bucketing.table(s, t))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"), max(col("session_seq")).as("n_sessions"))
      }),
      // r20 presentation-sort A/B: the r19 single-task form
      // (repartition(1).sortWithinPartitions) vs the registered
      // localCheckpoint + parallel orderBy — same pipeline, same output
      "x_sess_rep1" -> ((s, dir) => {
        import org.apache.spark.sql.functions._
        streaming.EventStreams.sessionize(Tables.load(s, dir, "events"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"), max(col("session_seq")).as("n_sessions"))
          .repartition(1).sortWithinPartitions("user_id")
      }),
      "x_anti_rep1" -> ((s, dir) => {
        import org.apache.spark.sql.functions._
        val c = Tables.catalog(s, dir)
        c("customer").df
          .join(c("orders").df.filter(col("o_orderstatus") === "F").select("o_custkey")
                  .hint("shuffle_hash"),
                col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .repartition(1).sortWithinPartitions("c_custkey")
      }),
      "x_asof_rep1" -> ((s, dir) => {
        import org.apache.spark.sql.functions._
        val ev = Tables.load(s, dir, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id").as("v_user"), col("ts").as("vts"),
            col("event_id").as("view_id"))
        operators.AsOf.asOfJoinBucketed(purchases, views, "user_id", "v_user", "ts", "vts",
            payload = Seq("view_id"), toleranceMillis = 3600_000L, bucketMillis = 3600_000L,
            tieBreak = Some("view_id"))
          .select(col("event_id"), col("view_id").as("asof_view_id"))
          .repartition(1).sortWithinPartitions("event_id")
      }),
      // q_anti_join levers (r20): bloom-prefilter the customer probe
      // (the q_dedup_exact_inc discipline — negatives skip the join), and
      // the key-sorted layout making a distinct-first build combine
      // map-side (the q_agg_topcust_sorted lesson)
      "x_anti_bloom" -> ((s, dir) => {
        import org.apache.spark.sql.functions._
        import org.apache.spark.sql.graftshim.ColumnShim
        // raise the bloom caps for THIS pipeline only, and restore after:
        // the caps also size Spark's own InjectRuntimeFilter blooms, so a
        // leaked raise would plan every LATER diag row under a different
        // optimizer configuration than a fresh session — exactly the
        // same-window discipline this tool exists to protect. The eager
        // localCheckpoint executes the bloom pipeline inside the window;
        // only the presentation sort runs after restore.
        val keys = Seq("spark.sql.optimizer.runtime.bloomFilter.maxNumBits",
                       "spark.sql.optimizer.runtime.bloomFilter.maxNumItems")
        val saved = keys.map(k => k -> s.conf.getOption(k))
        keys.zip(Seq("268435456", "33554432")).foreach { case (k, v) => s.conf.set(k, v) }
        try {
          val c = Tables.catalog(s, dir)
          val ordersF = c("orders").df.filter(col("o_orderstatus") === "F").select("o_custkey")
          val items = 16777216L
          val bloomDf = ordersF.select(
            ColumnShim.bloomFilterAgg(xxhash64(col("o_custkey")), items, items * 8).as("bf"))
          val flagged = c("customer").df.select("c_custkey", "c_name")
            .withColumn("__maybe",
              coalesce(ColumnShim.mightContain(ColumnShim.scalarSubquery(bloomDf),
                xxhash64(col("c_custkey"))), lit(false)))
          val negatives = flagged.filter(!col("__maybe")).select("c_custkey", "c_name")
          val positives = flagged.filter(col("__maybe")).select("c_custkey", "c_name")
          negatives.unionByName(
              positives.join(ordersF.hint("shuffle_hash"),
                col("c_custkey") === col("o_custkey"), "left_anti")
                .select("c_custkey", "c_name"))
            .localCheckpoint().orderBy("c_custkey")
        } finally saved.foreach {
          case (k, Some(v)) => s.conf.set(k, v)
          case (k, None)    => s.conf.unset(k)
        }
      }),
      "x_anti_sorted" -> ((s, dir) => {
        import org.apache.spark.sql.functions._
        val so = s.read.parquet(SparkEntry.custkeySortedOrders(s, dir))
        Tables.catalog(s, dir)("customer").df
          .join(so.filter(col("o_orderstatus") === "F").select("o_custkey")
                  .distinct().hint("shuffle_hash"),
                col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .localCheckpoint().orderBy("c_custkey")
      }),
      // q_text_topwords decomposition: tokenize-scan floor (no explode/agg)
      // and the aggregate without the trailing TakeOrdered
      "x_topwords_scan" -> ((s, dir) => {
        import org.apache.spark.sql.functions._
        Tables.load(s, dir, "documents")
          .select(sum(size(functions.TextFunctions.tokens(col("text")))).as("n_tokens"))
      }),
      "x_topwords_agg" -> ((s, dir) => {
        import org.apache.spark.sql.functions._
        Tables.load(s, dir, "documents")
          .select(explode(functions.TextFunctions.tokens(col("text"))).as("word"))
          .groupBy("word")
          .agg(count(lit(1)).as("cnt"))
      }),
      // anti-join build-side dedup: the shuffled-hash anti join builds a
      // HashedRelation of EVERY build row when only key PRESENCE matters —
      // a distinct() first shrinks the build ~5× (orders-F rows → distinct
      // custkeys) for one extra partial-agg pass
      "x_anti_distinct" -> ((s, dir) => {
        import org.apache.spark.sql.functions._
        val c = Tables.catalog(s, dir)
        c("customer").df
          .join(c("orders").df.filter(col("o_orderstatus") === "F")
                  .select("o_custkey").distinct()
                  .hint("shuffle_hash"),
                col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .repartition(1)
          .sortWithinPartitions("c_custkey")
      }),
      // q_events_window's pre-r15 decimal-sum form (A/B for Decimal128)
      "x_events_window_dec" -> ((s, dir) => {
        import org.apache.spark.sql.functions._
        Tables.load(s, dir, "events")
          .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
                   col("event_type"))
          .agg(count(lit(1)).as("event_cnt"),
               sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
          .orderBy("hour", "event_type")
      }))
    def query(n: String) = SparkEntry.queries.getOrElse(n, experiments(n))
    // warm each query once so the measured pass is JIT/cache-warm like Bench
    val qs = names.split(",").map(_.trim).filter(_.nonEmpty)
    qs.foreach { n =>
      query(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    qs.foreach { n =>
      // listener events are async (listenerBus is private[spark]): a short
      // sleep drains the bus well enough for a diagnostics count
      Thread.sleep(500)
      jobs.set(0); stages.set(0)
      val t0 = System.nanoTime()
      query(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"[plandiag] $n%-24s jobs=${jobs.get}%-3d stages=${stages.get}%-3d ${sec}%.3f s")
      // diagnostic experiments carrying a tiny answer print it
      if (n.startsWith("x_sem_sq8cand"))
        println(s"[plandiag] $n rows: " +
          query(n)(spark, sfDir).collect().mkString("; "))
    }
    spark.stop()
  }
}
