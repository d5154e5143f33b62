package graft.operators

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  // Planted corpus: 1↔2 near-dups (one word differs), 3 = exact dup of 1,
  // 4 and 5 unrelated.
  private val base =
    "the quick brown fox jumps over the lazy dog while rain falls on the quiet village road tonight"
  private lazy val docs = Seq(
    (1L, base),
    (2L, base.replace("lazy", "sleepy")),
    (3L, base),
    (4L, "completely different text about spark query engines and columnar parquet storage formats"),
    (5L, "yet another unrelated document mentioning neither foxes nor dogs just plain words here")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts and keeps the min id") {
    val out = Dedup.exact(docs).orderBy("keep_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L), (2L, 1L), (4L, 1L), (5L, 1L)))
  }

  test("MinHash-LSH finds the planted near-dup pairs and nothing else") {
    val pairs = Dedup.minhashLsh(docs, jaccardThreshold = 0.5)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // exact dups (1,3) share every band; near-dups (1,2) and (2,3) share most
    assert(pairs.contains((1L, 3L)))
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("exact duplicates have Jaccard 1.0 via verify") {
    val pairs = Seq((1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    val out = Dedup.jaccardVerify(pairs, docs).orderBy("id_b").collect()
    assert(out(0).getAs[Double]("jaccard") == 1.0)      // 1 vs 3
    assert(out(1).getAs[Double]("jaccard") < 0.05)       // 1 vs 4
  }

  test("SimHash: identical texts distance 0, near-dups small, unrelated large") {
    val sim = Dedup.simhashed(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(sim(a) ^ sim(b))
    assert(ham(1, 3) == 0)
    assert(ham(1, 2) <= 12)
    assert(ham(1, 4) > 12)
  }

  test("SimHash chunk-LSH pairs exact dups (distance 0 shares all chunks)") {
    val out = Dedup.simhashDupes(docs, maxHamming = 3)
      .orderBy("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out.contains((1L, 3L)))
    assert(!out.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("exactCorpus keeps one representative per distinct text") {
    val out = Dedup.exactCorpus(docs).orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L, 2L, 4L, 5L)) // 3 is an exact dup of 1
  }

  test("exactCorpusOnePass ≡ exactCorpus survivors; input subtree evaluated once") {
    val a = Dedup.exactCorpus(docs).orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    val b = Dedup.exactCorpusOnePass(docs).orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(a == b)
    // the one-pass form must contain NO join (the join form consumes its
    // input twice — the whole point of the variant is avoiding that)
    val plan = Dedup.exactCorpusOnePass(docs).queryExecution.executedPlan.toString
    assert(!"(?i)join".r.findFirstIn(plan).isDefined, plan)
  }

  test("minhashCorpus drops near-dups keeping the lowest id") {
    val out = Dedup.minhashCorpus(docs, jaccardThreshold = 0.5)
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L, 4L, 5L)) // 2 and 3 near/exact match 1
  }

  test("minhashIncremental drops new docs matching corpus or earlier new, keeps the rest") {
    // corpus holds ids 1-5 (docs); the new batch: 10 near-dups corpus doc 1,
    // 11 is unique, 12 near-dups 11 (within-batch, higher id loses), 13 unique
    val newDocs = Seq(
      (10L, base.replace("tonight", "today")),
      (11L, "fresh unseen content describing glacier meltwater chemistry in alpine lakes region"),
      (12L, "fresh unseen content describing glacier meltwater chemistry in alpine lakes valley"),
      (13L, "entirely new record on bee navigation using polarized light patterns over meadows")
    ).toDF("doc_id", "text")
    val kept = Dedup.minhashIncremental(newDocs, docs, jaccardThreshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(11L, 13L), s"kept $kept")
    // corpus is untouched input — survivors come only from the new batch
    assert(!kept.exists(_ <= 5L))
    // with a pre-built corpus index — minhashed() output passed VERBATIM,
    // per the documented contract — the result is identical
    val idx = Dedup.minhashed(docs)
    val keptIdx = Dedup.minhashIncremental(newDocs, docs, jaccardThreshold = 0.5,
        corpusIndex = Some(idx))
      .select("doc_id").as[Long].collect().toSet
    assert(keptIdx == kept)
    // an index built under different k/bands fails fast instead of silently
    // probing meaningless buckets
    val err = intercept[Throwable] {
      Dedup.minhashIncremental(newDocs, docs, k = 16, bands = 4,
        jaccardThreshold = 0.5, corpusIndex = Some(idx)).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(err).exists(_.contains("rebuild the index")), s"got: ${messages(err)}")
  }

  test("no crossJoin in any dedup plan") {
    for (df <- Seq(Dedup.minhashLsh(docs), Dedup.simhashDupes(docs))) {
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.toLowerCase.contains("cartesian"), s"cartesian product in:\n$plan")
    }
  }

  test("exactIncremental: corpus matches dropped, within-batch min-id kept, rest survive") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha text"), (2L, "beta text"), (3L, "gamma text")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha text"),   // exact corpus dup -> dropped
      (11L, "fresh one"),    // new -> kept
      (12L, "fresh two"),    // within-batch dup group, min id -> kept
      (13L, "fresh two"),    // -> dropped
      (14L, "beta text"),    // corpus dup -> dropped
      (15L, "fresh three")   // new -> kept
    ).toDF("doc_id", "text")
    val out = Dedup.exactIncremental(batch, corpus)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(11L, 12L, 15L))
  }

  test("exactIncremental stays exact under a deliberately tiny Bloom (high FP rate)") {
    import spark.implicits._
    // 64-bit sketch over 200 corpus docs: most probes are false positives,
    // so nearly every batch doc takes the verify path — the result must not
    // change (Bloom is a prefilter, never a decision).
    val corpus = (0L until 200L).map(i => (i, s"corpus doc $i")).toDF("doc_id", "text")
    val batch = (0L until 50L).map(i =>
      (1000L + i, if (i % 5 == 0) s"corpus doc $i" else s"batch doc $i")).toDF("doc_id", "text")
    val out = Dedup.exactIncremental(batch, corpus,
        expectedCorpusItems = 1L, bloomBitsPerItem = 1)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val expected = (0L until 50L).filter(_ % 5 != 0).map(1000L + _).toSeq
    assert(out == expected)
  }

  test("exactIncremental: NULL texts group within the batch (exact() policy), never match corpus") {
    import spark.implicits._
    val corpus = Seq((1L, Option.empty[String]), (2L, Some("real"))).toDF("doc_id", "text")
    val batch = Seq(
      (10L, Option.empty[String]), (11L, Option.empty[String]), (12L, Some("other"))
    ).toDF("doc_id", "text")
    val out = Dedup.exactIncremental(batch, corpus)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // NULL-text batch docs dedup to min id 10 (like exact()'s hash group-by);
    // the corpus NULL doesn't match them (null-strict comparison).
    assert(out == Seq(10L, 12L))
  }

  test("exactIncremental plan: corpus side never exchanges; candidate joins broadcast") {
    import spark.implicits._
    val corpus = (0L until 100L).map(i => (i, s"c $i")).toDF("doc_id", "text")
    val batch = (0L until 10L).map(i => (500L + i, s"b $i")).toDF("doc_id", "text")
    val plan = Dedup.exactIncremental(batch, corpus).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast joins in:\n$plan")
    assert(!plan.toLowerCase.contains("cartesian"))
  }

  test("exactIncremental: EMPTY corpus keeps the whole batch (within-batch-deduped), not zero rows") {
    import spark.implicits._
    // Review regression: bloom_filter_agg over zero rows is NULL and
    // might_contain(NULL, _) is NULL — without the coalesce both filter legs
    // dropped every row and the first-ever ingest vanished.
    val corpus = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val batch = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "text")
    val out = Dedup.exactIncremental(batch, corpus)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(1L, 3L))
  }

  test("exactIncremental rejects sizings Spark would silently clamp (maxNumBits)") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.exactIncremental(df, df, expectedCorpusItems = 100000000L, bloomBitsPerItem = 8)
    }
    assert(e.getMessage.contains("maxNumBits"))
  }

  test("exactIncremental rejects item estimates Spark would silently clamp (maxNumItems)") {
    import spark.implicits._
    // 8M items × 8 bits = 64M bits — UNDER the default maxNumBits budget,
    // but the item estimate itself clamps at maxNumItems (default 4M),
    // skewing the derived hash-function count. Advisory regression: the
    // bits guard alone let this sizing through.
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.exactIncremental(df, df, expectedCorpusItems = 8000000L, bloomBitsPerItem = 8)
    }
    assert(e.getMessage.contains("maxNumItems"))
  }

  test("minhashIncrementalIndexed matches minhashIncremental on the same corpus") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val corpus = (0L until 40L).map(i => (i, s"corpus doc $i some shared words ${i % 5}"))
      .toDF("doc_id", "text")
    val batch = (100L until 120L).map(i =>
      (i, if (i % 4 == 0) s"corpus doc ${i - 100} some shared words ${(i - 100) % 5}"
          else s"novel batch doc $i unlike anything")).toDF("doc_id", "text")
    val direct = Dedup.minhashIncremental(batch, corpus)
      .select("doc_id").as[Long].collect().toSet
    val idx = Dedup.minhashed(corpus).select(
      col("doc_id").as("id"), col("shingle_hashes").as("sh"),
      posexplode(col("band_hashes")).as(Seq("band", "bhash")))
    val viaIndex = Dedup.minhashIncrementalIndexed(batch, idx)
      .select("doc_id").as[Long].collect().toSet
    assert(viaIndex == direct)
    // An index built with more bands than the call expects raises per-row.
    val bad = idx.withColumn("band", col("band") + 100)
    intercept[Exception] {
      Dedup.minhashIncrementalIndexed(batch, bad).collect()
    }
  }
}
