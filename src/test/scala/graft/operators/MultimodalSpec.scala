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
    // the fake "image" bytes aren't decodable → stub fallback, flagged as such
    assert(out1.forall(!_.getAs[Boolean]("decoded")))
  }

  test("real PNG decodes via ImageIO: true dimensions + luminance grid features") {
    import java.awt.image.BufferedImage
    // 8×6 synthetic image: left half black, right half white
    val img = new BufferedImage(8, 6, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 6; x <- 0 until 8)
      img.setRGB(x, y, if (x < 4) 0x000000 else 0xffffff)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray

    val rows = Seq(
      Row(10L, "image", png, Row(8, 6, null, "image/png")),
      Row(11L, "image", Array[Byte](0, 1, 2), Row(null, null, null, "image/png")), // corrupt
      Row(12L, "audio", png, Row(null, null, 99L, "audio/wav")) // kind gates decode, not content
    )
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), Multimodal.assetSchema)
    val out = Multimodal.extractFeatures(df, dim = 4).orderBy("asset_id").collect()

    val real = out(0)
    assert(real.getAs[Boolean]("decoded"))
    assert(real.getAs[Int]("width") == 8 && real.getAs[Int]("height") == 6)
    // dim=4 → 2×2 grid: sampled columns 0 and 4 → black (0.0) and white (1.0)
    val feats = real.getAs[scala.collection.Seq[Float]]("features")
    assert(feats == Seq(0f, 1f, 0f, 1f))

    val corrupt = out(1)
    assert(!corrupt.getAs[Boolean]("decoded") && corrupt.isNullAt(corrupt.fieldIndex("width")))
    val audio = out(2)
    assert(!audio.getAs[Boolean]("decoded")) // audio stays on the stub path

    // direct decode API: the same bytes give the same image
    val decoded = Multimodal.decodeImage(png).get
    assert(decoded.getWidth == 8 && decoded.getHeight == 6)
    assert(Multimodal.decodeImage(Array[Byte](9, 9)).isEmpty)
    assert(Multimodal.decodeImage(null).isEmpty)
    // degenerate dims degrade like stubDecode, never crash the scan
    assert(Multimodal.imageGridFeatures(decoded, 0).isEmpty)
    assert(Multimodal.imageGridFeatures(decoded, -3).isEmpty)
    assert(Multimodal.imageGridFeatures(decoded, 1).length == 1)
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
