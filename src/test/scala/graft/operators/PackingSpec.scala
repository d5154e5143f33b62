package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(lens: Seq[Int]) =
    lens.zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("id", "tok")

  test("packs fill to capacity in id order within each lane") {
    // one lane: token counts 300+300 straddle the 512 boundary
    val packed = Packing.packBySequence(docs(Seq(300, 300, 300, 300)), "id", "tok",
      capacity = 512L, shards = 1)
      .orderBy("id").select("id", "pack_id").as[(Long, Long)].collect()
    // start offsets 0,300,600,900 → packs 0,0,1,1
    assert(packed.toSeq == Seq((0L, 0L), (1L, 0L), (2L, 1L), (3L, 1L)))
  }

  test("a doc longer than capacity spans forward; later docs shift past it") {
    val packed = Packing.packBySequence(docs(Seq(100, 2000, 100)), "id", "tok",
      capacity = 512L, shards = 1)
      .orderBy("id").select("id", "pack_id").as[(Long, Long)].collect()
    // offsets 0,100,2100 → packs 0, 0, 4
    assert(packed.toSeq == Seq((0L, 0L), (1L, 0L), (2L, 4L)))
  }

  test("lanes are independent and hash-disjoint; utilization ≤ 1 except oversize docs") {
    val df = docs(Seq.tabulate(200)(i => 50 + (i % 90)))
    val packed = Packing.packBySequence(df, "id", "tok", capacity = 512L, shards = 4)
    assert(packed.select("shard").distinct().count() == 4)
    // every (shard,pack) except possibly each lane's LAST pack holds ≥ the
    // capacity minus one doc's tail (no pathological under-fill)
    val util = Packing.packUtilization(packed, "tok", 512L)
    val full = util.as[(Int, Long, Long, Long, Double, Boolean)].collect()
    full.foreach { case (_, _, n, toks, u, over) =>
      assert(n >= 1 && toks > 0 && u > 0.0)
      assert(toks <= 512L + 139L, s"pack overfilled beyond capacity + max single doc: $toks")
      assert(over == (toks > 512L), "overfilled flag must mirror tokens > capacity")
    }
    // determinism: recomputing yields the identical assignment
    val again = Packing.packBySequence(df, "id", "tok", capacity = 512L, shards = 4)
    assert(packed.except(again).isEmpty && again.except(packed).isEmpty)
  }

  test("invalid parameters rejected") {
    intercept[IllegalArgumentException](Packing.packBySequence(docs(Seq(1)), "id", "tok", 0L))
    intercept[IllegalArgumentException](Packing.packBySequence(docs(Seq(1)), "id", "tok", 512L, 0))
  }

  test("boundary-straddling pack is flagged overfilled (ADVICE r6: not silent)") {
    // capacity 512, docs 300+300 → both land in pack 0 with 600 tokens
    val packed = Packing.packBySequence(docs(Seq(300, 300)), "id", "tok",
      capacity = 512L, shards = 1)
    val util = Packing.packUtilization(packed, "tok", 512L)
      .as[(Int, Long, Long, Long, Double, Boolean)].collect().toSeq
    assert(util == Seq((0, 0L, 2L, 600L, 1.1719, true)))
  }

  test("input columns colliding with shard/pack_id are rejected, not overwritten") {
    val withShard = docs(Seq(1, 2)).withColumn("shard", lit(9))
    intercept[IllegalArgumentException](
      Packing.packBySequence(withShard, "id", "tok", 512L))
    val withPack = docs(Seq(1, 2)).withColumn("pack_id", lit(9L))
    intercept[IllegalArgumentException](
      Packing.packBySequence(withPack, "id", "tok", 512L))
  }
}
