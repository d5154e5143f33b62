package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private lazy val assets = {
    val rows = Seq(
      Row(1L, "image", Array[Byte](1, 2, 3, 4), Row(64, 48, null, "image/png")),
      Row(2L, "image", Array[Byte](9, 9, 9), Row(32, 32, null, "image/jpeg")),
      Row(3L, "video", Array[Byte](5, 5), Row(640, 480, 3500L, "video/mp4")),
      Row(4L, "audio", null, Row(null, null, 1200L, "audio/wav"))
    )
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.assetSchema)
  }

  test("asset schema roundtrips binary + typed metadata through parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mm").toString + "/assets"
    assets.write.parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("bytes").dataType == BinaryType)
    assert(back.count() == 4)
    val img = back.filter(org.apache.spark.sql.functions.col("asset_id") === 1L).head()
    assert(img.getAs[Row]("meta").getAs[Int]("width") == 64)
  }

  test("batched feature extraction: stable features, null-payload safe") {
    val out1 = Multimodal.extractFeatures(assets, dim = 8).orderBy("asset_id").collect()
    val out2 = Multimodal.extractFeatures(assets, dim = 8).orderBy("asset_id").collect()
    assert(out1.length == 4)
    // deterministic across runs
    assert(out1.map(_.getAs[scala.collection.Seq[Float]]("features")).toSeq ==
           out2.map(_.getAs[scala.collection.Seq[Float]]("features")).toSeq)
    // different payloads → different features; null payload → zero vector
    val f = out1.map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Float]]("features")).toMap
    assert(f(1L) != f(2L))
    assert(f(4L).forall(_ == 0f))
    assert(out1.map(_.getAs[Int]("n_bytes")).toSeq == Seq(4, 3, 2, 0))
  }

  test("video frame sampling emits one row per interval") {
    val frames = Multimodal.sampleFrames(assets, everyMs = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(frames == Seq((3L, 0L), (3L, 1000L), (3L, 2000L), (3L, 3000L)))
  }

  test("byte-budget repartitioning yields ceil(total/target) partitions") {
    val parts = Multimodal.repartitionByBytes(assets, targetBytes = 4L)
      .rdd.getNumPartitions
    assert(parts == 3) // 9 payload bytes / 4-byte budget
  }
}
