package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class CorpusCardSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int): DataFrame = {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "the", "of", "zig")
    val rnd = new scala.util.Random(11)
    (0 until n).map { i =>
      val text = Seq.fill(3 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (i.toLong, if (i % 4 == 0) "en" else if (i % 4 == 1) "fr" else "de",
        text, text.length.toLong)
    }.toDF("doc_id", "lang", "text", "n_chars")
  }

  private def card(df: DataFrame): Seq[(String, Long, Long, Double, Long, Long)] =
    df.orderBy("lang").collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5))).toSeq

  test("merged daily states finish to the same exact columns as one whole-corpus sketch") {
    val all = docs(400)
    val days = (0 until 3).map(d => all.filter(col("doc_id") % 3 === d))
    val merged = CorpusCard.merge(days.map(CorpusCard.sketchSlice(_)).reduce(_ unionByName _))
    val whole = CorpusCard.sketchSlice(all)
    val mc = card(CorpusCard.finish(merged))
    val wc = card(CorpusCard.finish(whole))
    // exact columns (n_docs, total_tokens, avg_quality) must be BIT-equal;
    // p50 shares the bucket histogram so it is equal too; the HLL estimate
    // may differ between a direct sketch and a union of slice sketches only
    // within sketch error — here (few hundred distinct) both are exact.
    assert(mc == wc, s"merged=$mc whole=$wc")
  }

  test("sketchSlicesOnePass states equal the per-slice sketchSlice union (r21 single-scan rewrite)") {
    // includes NEGATIVE doc_ids: the union's `% 3 === d` enumeration
    // excludes negative NON-multiples of 3 (Spark % keeps the dividend's
    // sign: -1 % 3 = -1) but negative MULTIPLES of 3 land in d = 0
    // (-3 % 3 = 0), and groupBy is TOTAL over the slice expression — so
    // the documented recipe is the isin(0,1,2) domain pre-filter on the
    // one-pass side (NOT doc_id >= 0, which would drop the -3k rows the
    // union keeps); the result must then be row-identical to the union.
    val all = docs(400).unionByName(
      docs(30).withColumn("doc_id", -col("doc_id") - 1))
    val union = (0 until 3).map(d => CorpusCard.sketchSlice(all.filter(col("doc_id") % 3 === d)))
      .reduce(_ unionByName _)
    val onePass = CorpusCard.sketchSlicesOnePass(
      all.filter((col("doc_id") % 3).isInCollection(Seq(0, 1, 2))), col("doc_id") % 3)
    def stateRows(df: DataFrame) = df
      .select(col("lang"), col("n_docs"), col("total_tokens"), col("quality_sum"),
        to_json(col("chars_hist")).as("hist"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDecimal(3).toString, r.getString(4))).toSeq.sorted
    // the exact state columns must match row-for-row (one state per (day, lang),
    // slice id dropped); the HLL binary's serialized form may legally differ
    // with accumulation order, so the estimate is checked through finish()
    assert(stateRows(onePass) == stateRows(union))
    assert(card(CorpusCard.finish(CorpusCard.merge(onePass)))
      == card(CorpusCard.finish(CorpusCard.merge(union))))
  }

  test("sketch state survives a parquet round trip (HLL binary + histogram map)") {
    val all = docs(300)
    val dir = java.nio.file.Files.createTempDirectory("graft-card").toString
    (0 until 2).foreach { d =>
      CorpusCard.sketchSlice(all.filter(col("doc_id") % 2 === d))
        .write.mode("overwrite").parquet(s"$dir/day=$d")
    }
    val restored = CorpusCard.merge(spark.read.parquet(s"$dir/day=0")
      .unionByName(spark.read.parquet(s"$dir/day=1")))
    val direct = CorpusCard.merge((0 until 2).map(d =>
      CorpusCard.sketchSlice(all.filter(col("doc_id") % 2 === d))).reduce(_ unionByName _))
    assert(card(CorpusCard.finish(restored)) == card(CorpusCard.finish(direct)))
  }

  test("merge is associative: weekly rollup of daily states equals flat merge") {
    val all = docs(360)
    val days = (0 until 4).map(d => CorpusCard.sketchSlice(all.filter(col("doc_id") % 4 === d)))
    val flat = CorpusCard.merge(days.reduce(_ unionByName _))
    val rolled = CorpusCard.merge(
      CorpusCard.merge(days(0) unionByName days(1))
        .unionByName(CorpusCard.merge(days(2) unionByName days(3))))
    assert(card(CorpusCard.finish(rolled)) == card(CorpusCard.finish(flat)))
  }

  test("exact columns match a direct aggregate; estimates carry their documented bounds") {
    val all = docs(500)
    val got = card(CorpusCard.finish(CorpusCard.sketchSlice(all))).map(t => t._1 -> t).toMap
    val exact = all.groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        sum(graft.functions.TextFunctions.tokenCount(col("text")).cast("long")).as("tok"),
        round(sum(graft.functions.TextFunctions.qualityScore(col("text"))
          .cast("decimal(18,6)")).cast("double") / count(col("text")), 4).as("avg_q"),
        expr("percentile(n_chars, 0.5)").as("p50"),
        countDistinct(md5(col("text"))).as("uniq"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getLong(5))).toMap
    exact.foreach { case (lang, (n, tok, q, p50, uniq)) =>
      val (_, gn, gtok, gq, gp50, guniq) = got(lang)
      assert(gn == n && gtok == tok && gq == q, s"$lang exact columns diverge")
      assert(math.abs(gp50 - p50) <= 50.0, s"$lang p50 est $gp50 vs exact $p50 (bucket bound 50)")
      assert(math.abs(guniq - uniq) <= math.max(1L, (uniq * 0.05).toLong),
        s"$lang distinct est $guniq vs exact $uniq")
    }
  }

  test("histogram p50 lands in the right bucket on a known distribution") {
    // 90 docs of 10 chars, 11 of 260 chars: median = 10 → bucket 0 → est 25
    val df = ((0 until 90).map(i => (i.toLong, "en", "aaaa", 10L)) ++
      (90 until 101).map(i => (i.toLong, "en", "bbbb", 260L)))
      .toDF("doc_id", "lang", "text", "n_chars")
    val got = card(CorpusCard.finish(CorpusCard.sketchSlice(df)))
    assert(got.head._5 == 25L, s"expected bucket-0 midpoint 25, got ${got.head._5}")
  }

  test("missing columns and bad bucket width are rejected") {
    val df = Seq((1L, "en", "x", 1L)).toDF("doc_id", "lang", "text", "n_chars")
    intercept[IllegalArgumentException](CorpusCard.sketchSlice(df.drop("n_chars")))
    intercept[IllegalArgumentException](CorpusCard.sketchSlice(df, bucketWidth = 0))
  }

  test("streaming rolling card: foreachBatch states merge to the whole-stream card") {
    // The production shape for a CONTINUOUS datasheet: the ingest stream's
    // micro-batches each write their sketch state next to the batch
    // (foreachBatch), and the live card at any moment is merge(states) —
    // no batch is ever rescanned. Equality against the one-shot card of
    // everything streamed is the whole contract.
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, String, String, Long)]
    val dir = java.nio.file.Files.createTempDirectory("graft-card-stream").toString
    val q = mem.toDF().toDF("doc_id", "lang", "text", "n_chars")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        CorpusCard.sketchSlice(batch)
          .write.mode("overwrite").parquet(s"$dir/batch=$id"): Unit
      }
      .start()
    val all = docs(240).as[(Long, String, String, Long)].collect().toSeq
    try {
      all.grouped(80).foreach { chunk =>
        mem.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val states = spark.read.parquet(s"$dir/batch=*")
    val got = card(CorpusCard.finish(CorpusCard.merge(states)))
    val want = card(CorpusCard.finish(CorpusCard.sketchSlice(
      all.toDF("doc_id", "lang", "text", "n_chars"))))
    assert(got == want, s"streamed-card $got != one-shot $want")
  }
}
