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

  private def pcm16Wav(samples: Array[Int], sampleRate: Float, channels: Int): Array[Byte] = {
    // interleaved 16-bit signed little-endian PCM → WAV via the JDK writer
    val data = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) {
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, channels, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length / channels)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  test("real WAV decodes via AudioSystem: exact sample count, metadata and RMS windows") {
    // 1600 mono samples at 8 kHz: first half constant 16384 (= 0.5 exactly
    // in normalized float), second half silence — every expected value below
    // is exactly representable, so the asserts are equality, not tolerance
    val wav = pcm16Wav(Array.tabulate(1600)(i => if (i < 800) 16384 else 0), 8000f, 1)
    val a = Multimodal.decodeAudio(wav).get
    assert(a.sampleRate == 8000f && a.channels == 1 && a.frames == 1600L)
    assert(a.durationMs == 200L) // 1600 frames / 8000 Hz
    assert(a.samples.length == 1600)
    assert(a.samples(0) == 0.5f && a.samples(799) == 0.5f && a.samples(800) == 0f)
    // per-window RMS: rms([0.5]*800) = 0.5 exactly, rms(silence) = 0
    assert(Multimodal.audioRmsFeatures(a, 2).toSeq == Seq(0.5f, 0f))
    // 4 windows: 0.5, 0.5, 0, 0
    assert(Multimodal.audioRmsFeatures(a, 4).toSeq == Seq(0.5f, 0.5f, 0f, 0f))
    assert(Multimodal.audioRmsFeatures(a, 0).isEmpty) // degenerate-dims contract

    // stereo mixdown: L=+16384, R=-16384 every frame → mono exactly 0
    val st = Multimodal.decodeAudio(
      pcm16Wav(Array.tabulate(400)(i => if (i % 2 == 0) 16384 else -16384), 8000f, 2)).get
    assert(st.channels == 2 && st.frames == 200L)
    assert(st.samples.forall(_ == 0f))

    // degrade-don't-fail: garbage, truncated, null
    assert(Multimodal.decodeAudio(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.decodeAudio(wav.take(16)).isEmpty)
    assert(Multimodal.decodeAudio(null).isEmpty)
  }

  private def u32be(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  test("MP4 container probe reads mvhd duration without a codec") {
    def box(tpe: String, body: Array[Byte]): Array[Byte] =
      u32be(8L + body.length) ++ tpe.getBytes("US-ASCII") ++ body
    // version-0 mvhd: ver+flags, creation, modification, timescale=1000, duration=3500
    val mvhd0 = box("mvhd", Array[Byte](0, 0, 0, 0) ++ u32be(0) ++ u32be(0) ++
      u32be(1000) ++ u32be(3500))
    val ftyp = box("ftyp", "isom0000".getBytes("US-ASCII"))
    assert(Multimodal.probeMp4DurationMs(ftyp ++ box("moov", mvhd0)) == Some(3500L))
    // version-1 mvhd: 64-bit times/duration, timescale still u32
    val mvhd1 = box("mvhd", Array[Byte](1, 0, 0, 0) ++ Array.fill(16)(0: Byte) ++
      u32be(90000) ++ u32be(0) ++ u32be(180000))
    assert(Multimodal.probeMp4DurationMs(box("moov", mvhd1)) == Some(2000L))
    // malformed inputs degrade to None, never throw
    assert(Multimodal.probeMp4DurationMs("nonsense bytes".getBytes).isEmpty)
    assert(Multimodal.probeMp4DurationMs(box("moov", Array[Byte](1, 2))).isEmpty)
    assert(Multimodal.probeMp4DurationMs(null).isEmpty)
  }

  test("MP4 probe handles largesize (size==1) and to-end-of-file (size==0) boxes") {
    def u64be(v: Long): Array[Byte] = u32be(v >>> 32) ++ u32be(v & 0xffffffffL)
    def box(tpe: String, body: Array[Byte]): Array[Byte] =
      u32be(8L + body.length) ++ tpe.getBytes("US-ASCII") ++ body
    // 64-bit largesize encoding: compact size field == 1, real size after the type
    def largeBox(tpe: String, body: Array[Byte]): Array[Byte] =
      u32be(1L) ++ tpe.getBytes("US-ASCII") ++ u64be(16L + body.length) ++ body
    // size == 0: box extends to the end of the enclosing box / file
    def tailBox(tpe: String, body: Array[Byte]): Array[Byte] =
      u32be(0L) ++ tpe.getBytes("US-ASCII") ++ body
    val mvhd0 = box("mvhd", Array[Byte](0, 0, 0, 0) ++ u32be(0) ++ u32be(0) ++
      u32be(1000) ++ u32be(3500))
    // a largesize mdat BEFORE moov must not terminate the top-level walk
    val largeMdat = largeBox("mdat", Array.fill(24)(7: Byte))
    assert(Multimodal.probeMp4DurationMs(largeMdat ++ box("moov", mvhd0)) == Some(3500L))
    // moov itself encoded with largesize probes fine (body starts after the u64)
    assert(Multimodal.probeMp4DurationMs(largeBox("moov", mvhd0)) == Some(3500L))
    // moov as the spec's last-box size==0 encoding probes fine
    val ftyp = box("ftyp", "isom0000".getBytes("US-ASCII"))
    assert(Multimodal.probeMp4DurationMs(ftyp ++ tailBox("moov", mvhd0)) == Some(3500L))
    // truncated largesize header (8 bytes only) degrades to None, not a throw
    assert(Multimodal.probeMp4DurationMs(u32be(1L) ++ "mdat".getBytes("US-ASCII")).isEmpty)
    // largesize smaller than its own 16-byte header is malformed → walk ends
    assert(Multimodal.probeMp4DurationMs(
      u32be(1L) ++ "mdat".getBytes("US-ASCII") ++ u64be(8L) ++ box("moov", mvhd0)).isEmpty)
  }

  test("MP4 probe reads per-track kind, duration and 16.16 dimensions") {
    def box(tpe: String, body: Array[Byte]): Array[Byte] =
      u32be(8L + body.length) ++ tpe.getBytes("US-ASCII") ++ body
    val mvhd = box("mvhd", Array[Byte](0, 0, 0, 0) ++ u32be(0) ++ u32be(0) ++
      u32be(1000) ++ u32be(3500)) // timescale 1000, duration 3500ms
    // tkhd v0: ver/flags, creation, modification, id, reserved, duration,
    // then 52 reserved/layer/matrix bytes, then 16.16 width/height
    def tkhd(duration: Long, w: Int, h: Int) =
      box("tkhd", Array[Byte](0, 0, 0, 0) ++ u32be(0) ++ u32be(0) ++ u32be(1) ++
        u32be(0) ++ u32be(duration) ++ Array.fill(52)(0: Byte) ++
        u32be(w.toLong << 16) ++ u32be(h.toLong << 16))
    def hdlr(kind: String) =
      box("hdlr", Array[Byte](0, 0, 0, 0) ++ u32be(0) ++ kind.getBytes("US-ASCII"))
    val vtrak = box("trak", tkhd(3500, 640, 360) ++ box("mdia", hdlr("vide")))
    val strak = box("trak", tkhd(3450, 0, 0) ++ box("mdia", hdlr("soun")))
    val meta = Multimodal.probeMp4(box("moov", mvhd ++ vtrak ++ strak)).get
    assert(meta.durationMs == 3500L)
    assert(meta.tracks == Seq(
      Multimodal.Mp4Track("vide", Some(3500L), Some(640), Some(360)),
      Multimodal.Mp4Track("soun", Some(3450L), None, None)))
    // the all-ones "duration unknown" sentinel (fragmented MP4s) must probe
    // as None, not as ~49.7 days of garbage
    val mvhdUnknown = box("mvhd", Array[Byte](0, 0, 0, 0) ++ u32be(0) ++ u32be(0) ++
      u32be(1000) ++ u32be(0xffffffffL))
    assert(Multimodal.probeMp4(box("moov", mvhdUnknown ++ vtrak)).isEmpty)
    val vtrakUnknown = box("trak", tkhd(0xffffffffL, 640, 360) ++ box("mdia", hdlr("vide")))
    val m2 = Multimodal.probeMp4(box("moov", mvhd ++ vtrakUnknown)).get
    assert(m2.tracks == Seq(Multimodal.Mp4Track("vide", None, Some(640), Some(360))))
    // extractFeatures surfaces the video track's presentation size
    val rows = Seq(Row(30L, "video", box("moov", mvhd ++ vtrak),
      Row(null, null, null, "video/mp4")))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), Multimodal.assetSchema)
    val out = Multimodal.extractFeatures(df, dim = 2).collect().head
    assert(!out.getAs[Boolean]("decoded") && out.getAs[Long]("duration_ms") == 3500L)
    assert(out.getAs[Int]("width") == 640 && out.getAs[Int]("height") == 360)
  }

  test("extractFeatures decodes audio for real and probes video duration") {
    val wav = pcm16Wav(Array.tabulate(1600)(i => if (i < 800) 16384 else 0), 8000f, 1)
    def box(tpe: String, body: Array[Byte]): Array[Byte] =
      u32be(8L + body.length) ++ tpe.getBytes("US-ASCII") ++ body
    val mp4 = box("moov", box("mvhd", Array[Byte](0, 0, 0, 0) ++ u32be(0) ++ u32be(0) ++
      u32be(1000) ++ u32be(3500)))
    val rows = Seq(
      Row(20L, "audio", wav, Row(null, null, null, "audio/wav")),
      Row(21L, "video", mp4, Row(null, null, null, "video/mp4")))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), Multimodal.assetSchema)
    val out = Multimodal.extractFeatures(df, dim = 2).orderBy("asset_id").collect()
    val audio = out(0)
    assert(audio.getAs[Boolean]("decoded"))
    assert(audio.getAs[Int]("sample_rate") == 8000 && audio.getAs[Int]("channels") == 1)
    assert(audio.getAs[Long]("duration_ms") == 200L)
    assert(audio.getAs[scala.collection.Seq[Float]]("features") == Seq(0.5f, 0f))
    val video = out(1)
    assert(!video.getAs[Boolean]("decoded")) // frames stay stubbed (no JDK video codec)
    assert(video.getAs[Long]("duration_ms") == 3500L) // but the container header parse is real
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
