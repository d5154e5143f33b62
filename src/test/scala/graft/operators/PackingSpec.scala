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
    val full = util.as[(Int, Long, Long, Long, Double)].collect()
    full.foreach { case (_, _, n, toks, u) =>
      assert(n >= 1 && toks > 0 && u > 0.0)
      assert(toks <= 512L + 139L, s"pack overfilled beyond capacity + max single doc: $toks")
    }
    // determinism: recomputing yields the identical assignment
    val again = Packing.packBySequence(df, "id", "tok", capacity = 512L, shards = 4)
    assert(packed.except(again).isEmpty && again.except(packed).isEmpty)
  }

  test("invalid parameters rejected") {
    intercept[IllegalArgumentException](Packing.packBySequence(docs(Seq(1)), "id", "tok", 0L))
    intercept[IllegalArgumentException](Packing.packBySequence(docs(Seq(1)), "id", "tok", 512L, 0))
  }
}
