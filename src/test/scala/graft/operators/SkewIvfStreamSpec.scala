package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.streaming.EventStreams
import graft.streaming.EventStreams.{ClosedSession, Event}

class SkewIvfStreamSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join result on skewed data") {
    val large = (1 to 1000).map(i => (if (i % 10 == 0) 7L else i.toLong, s"v$i"))
      .toDF("k", "payload") // key 7 is hot
    val small = Seq((7L, "seven"), (3L, "three"), (8L, "eight")).toDF("k2", "name")
    val plain  = large.join(small, large("k") === small("k2"))
      .select("k", "payload", "name").orderBy("k", "payload")
      .collect().toSeq
    val salted = Skew.saltedJoin(large, small, "k", "k2")
      .select("k", "payload", "name").orderBy("k", "payload")
      .collect().toSeq
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("skew profile surfaces the hot key first") {
    val large = (1 to 1000).map(i => if (i % 10 == 0) 7L else i.toLong).toDF("k")
    val top = Skew.keySkewProfile(large, "k", topN = 1).head()
    assert(top.getLong(0) == 7L && top.getLong(1) == 101L)
  }

  test("IVF fit survives null embeddings in the sample window") {
    // a null vec in the fit sample must not NPE at the driver before
    // LocalKMeans's NaN/Inf guard can speak (advisory, round 8)
    val rnd = new scala.util.Random(5)
    val rows = (0L until 40L).map { i =>
      (i, if (i % 7 == 3) null else Seq.fill(4)(rnd.nextGaussian().toFloat))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val idx = Similarity.ivfIndex(emb, nlist = 2)
    assert(idx.centers.length == 2)
    // null rows still flow through assignment (NearestCenter yields null cell)
    assert(idx.assigned.count() == 40L)
  }

  test("IVF top-k recalls brute-force neighbors scanning only probed cells") {
    val dim = 16
    val rnd = new scala.util.Random(123)
    val centers = Array.fill(4, dim)(rnd.nextGaussian())
    val vecs = (0L until 200L).map { i =>
      val c = centers((i % 4).toInt)
      (i, c.map(x => (x + 0.15 * rnd.nextGaussian()).toFloat).toSeq)
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val exact  = Similarity.topKForId(emb, 0L, 10).collect().map(_.getAs[Long]("vec_id")).toSet
    lazy val idx = Similarity.ivfIndex(emb, nlist = 8)
    // nlist=8 over 4 natural clusters ⇒ the quantizer splits each cluster
    // in ~half, so the exact top-10 straddles up to 3 cells; nprobe=3
    // (still a strict subset of the 8) is the smallest probe with a recall
    // contract that doesn't hinge on which half the split put a neighbor in
    val approx = idx.topKForId(0L, 10, nprobe = 3).collect().map(_.getAs[Long]("vec_id")).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.7, s"IVF recall $recall; exact=$exact approx=$approx")
    // probing really restricts the scan: rows in the nprobe=3 nearest cells
    // (by the operator's own metric — squared Euclidean to the centroids,
    // mirroring topKForId's probe selection) must be a strict subset
    val qVec = idx.assigned.filter($"vec_id" === 0L)
      .select($"embedding".cast("array<double>")).head().getAs[scala.collection.Seq[Double]](0)
    val probeCells = idx.centers.zipWithIndex.map { case (c, i) =>
      (i, c.zip(qVec).map { case (x, y) => (x - y) * (x - y) }.sum)
    }.sortBy { case (i, d) => (d, i) }.take(3).map(_._1)
    val probedRows = idx.assigned.filter($"cell".isin(probeCells.toIndexedSeq: _*)).count()
    assert(probedRows < 200, s"nprobe=3 must scan a strict subset, scanned $probedRows")
    assert(idx.assigned.groupBy("cell").count().count() > 1, "quantizer collapsed")
  }

  test("flatMapGroupsWithState closes sessions on gap within the stream") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val mem = MemoryStream[Event]
    val q = EventStreams.streamingSessions(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      mem.addData(
        Event(ts("2026-01-01 09:00:00"), 1L),
        Event(ts("2026-01-01 09:10:00"), 1L),
        Event(ts("2026-01-01 10:00:00"), 1L), // 50-min gap → closes first session
        Event(ts("2026-01-01 09:00:00"), 2L))
      q.processAllAvailable()
      val closed = spark.table("sessions").as[ClosedSession].collect().toSeq
      assert(closed.map(c => (c.user_id, c.nEvents)) == Seq((1L, 2L)))
      assert(closed.head.startMs == ts("2026-01-01 09:00:00").getTime)
      assert(closed.head.endMs == ts("2026-01-01 09:10:00").getTime)

      // advance the watermark far past everyone's gap → event-time timeout
      // closes and evicts the remaining sessions
      mem.addData(Event(ts("2026-01-01 15:00:00"), 3L))
      q.processAllAvailable()
      mem.addData(Event(ts("2026-01-01 20:00:00"), 3L))
      q.processAllAvailable()
      val all = spark.table("sessions").as[ClosedSession].collect().toSeq
        .map(c => (c.user_id, c.nEvents)).sorted
      // user 1's 10:00 session and user 2's 09:00 session closed by timeout
      assert(all.contains((1L, 1L)) && all.contains((2L, 1L)))
    } finally q.stop()
  }

  test("IVF batch top-k: all cells probed equals batch brute force; default probe recalls well") {
    import org.apache.spark.sql.functions._
    val dim = 16
    val rnd = new scala.util.Random(321)
    val centers = Array.fill(4, dim)(rnd.nextGaussian())
    val vecs = (0L until 200L).map { i =>
      val c = centers((i % 4).toInt)
      (i, c.map(x => (x + 0.15 * rnd.nextGaussian()).toFloat).toSeq)
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val queries = emb.filter($"vec_id" % 40 === 0)
      .select($"vec_id".as("query_id"), $"embedding")
    val idx = Similarity.ivfIndex(emb, nlist = 8)
    def pairs(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = pairs(Similarity.bruteForceTopK(emb, queries, k = 5, excludeSelf = true).collect())
    // nprobe = nlist probes every cell -> identical to brute force
    val all = pairs(idx.topKBatch(queries, k = 5, nprobe = 8, excludeSelf = true).collect())
    assert(all == bf)
    val approx = pairs(idx.topKBatch(queries, k = 5, nprobe = 2, excludeSelf = true).collect())
    val recall = (bf & approx).size.toDouble / bf.size
    assert(recall >= 0.6, s"IVF batch recall $recall")
    // A query with the wrong dimensionality raises per-row instead of
    // silently returning k null-scored "neighbors" from arbitrary cells.
    val badQ = Seq((9000L, Seq(1.0f, 2.0f))).toDF("query_id", "embedding")
    val e = intercept[Exception] { idx.topKBatch(badQ, k = 3).collect() }
    assert(e.getMessage.contains("dims"), e.getMessage)
  }

  test("stored IVF index round-trips: loaded probe equals the in-memory one") {
    import org.apache.spark.sql.functions._
    dropTables("ivf_idx", "ivf_idx_centroids")
    try {
      val dim = 8
      val rnd = new scala.util.Random(99)
      val emb = (0L until 120L).map(i => (i, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq))
        .toDF("vec_id", "embedding")
      val queries = emb.filter($"vec_id" % 30 === 0)
        .select($"vec_id".as("query_id"), $"embedding")
      val built = Similarity.ivfIndex(emb, nlist = 4)
      Similarity.writeIvfIndex(built, "ivf_idx", buckets = 4)
      val loaded = Similarity.loadIvfIndex(spark, "ivf_idx")
      assert(loaded.centers.map(_.toSeq).toSeq == built.centers.map(_.toSeq).toSeq)
      def out(i: Similarity.IvfIndex) =
        i.topKBatch(queries, k = 3, nprobe = 2, excludeSelf = true).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
      assert(out(loaded) == out(built))
      // a table missing the layout fails with the rebuild message
      Seq((1L, 2L)).toDF("a", "b").write.mode("overwrite").saveAsTable("ivf_idx_centroids")
      spark.sql("DROP TABLE ivf_idx")
      Seq((1L, 2L)).toDF("vec_id", "b").write.saveAsTable("ivf_idx")
      val err = intercept[IllegalArgumentException] { Similarity.loadIvfIndex(spark, "ivf_idx") }
      assert(err.getMessage.contains("writeIvfIndex layout"), err.getMessage)
    } finally dropTables("ivf_idx", "ivf_idx_centroids")
  }
}
