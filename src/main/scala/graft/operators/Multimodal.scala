package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines: image/audio/video
  * travel as opaque `binary` columns with typed metadata; decode / feature
  * extraction runs batch-shaped on executors.
  *
  * IMAGES decode for real through the JDK's `javax.imageio` (PNG/JPEG/GIF/BMP
  * — no external libraries needed): [[decodeImage]] + [[imageGridFeatures]]
  * produce true dimensions and a luminance-grid feature vector. AUDIO/VIDEO
  * decode remains STUBBED deterministically ([[stubDecode]] — the JDK ships
  * no audio/video codecs and this environment has no external media libs);
  * everything around that stub is the real 100 TB plumbing: the schema
  * contract, the batched `mapPartitions` shape (one codec init per partition,
  * not per row — the Scala analogue of `mapInPandas`), and partition sizing
  * by byte budget.
  */
object Multimodal {

  /** Canonical asset schema: id + modality + payload + sidecar metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("mime", StringType, nullable = true)
    )), nullable = true)
  ))

  /** Real image decode — the JDK's ImageIO, no external libraries. Returns
    * None for null, truncated, or non-image payloads (the caller decides the
    * fallback; a corrupt sample must never kill a 100 TB scan). ImageIO
    * instances are not shared across threads; this constructs per call, which
    * inside `mapPartitions` amortizes to per-partition reader reuse in
    * ImageIO's internal SPI cache.
    */
  def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (bytes == null) None
    else
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case scala.util.control.NonFatal(_) => None }

  /** Fixed-length features from a decoded image: resample to a g×g grid
    * (g = ⌊√dim⌋), per-cell Rec.601 luminance in [0,1], tail zero-padded.
    * The resize-to-grid IS the "resize" step of the pipeline — nearest-pixel
    * sampling keeps it allocation-free and deterministic.
    */
  def imageGridFeatures(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
    if (dim <= 0) return Array.emptyFloatArray // match stubDecode's contract for degenerate dims
    val g = math.max(1, math.sqrt(dim.toDouble).toInt)
    val out = new Array[Float](dim)
    var y = 0
    while (y < g) {
      var x = 0
      while (x < g) {
        val px = img.getRGB(x * img.getWidth / g, y * img.getHeight / g)
        val r = (px >> 16) & 0xff; val gr = (px >> 8) & 0xff; val b = px & 0xff
        out(y * g + x) = (0.299f * r + 0.587f * gr + 0.114f * b) / 255f
        x += 1
      }
      y += 1
    }
    out
  }

  /** Deterministic decode stub for AUDIO/VIDEO payloads (images decode for
    * real — [[decodeImage]]): a real implementation would call the codec here
    * (JNI/FFI), one codec instance per partition. Returns a fixed-length
    * feature vector derived from content bytes — stable across runs/executors.
    */
  def stubDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    if (bytes == null) return Array.fill(dim)(0f)
    var h = 1125899906842597L
    val out = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    var d = 0
    while (d < dim) {
      h ^= (h << 13); h ^= (h >>> 7); h ^= (h << 17) // xorshift
      out(d) = ((h % 1000L) / 1000.0f)
      d += 1
    }
    out
  }

  private case class Extracted(asset_id: Long, kind: String, n_bytes: Int,
                               decoded: Boolean, width: Option[Int], height: Option[Int],
                               features: Array[Float])

  /** Batch-shaped feature extraction: `mapPartitions` so decoder init happens
    * once per partition (the expensive part for real codecs), rows stream
    * through without per-row setup. Images decode for real (true
    * width/height + luminance-grid features, `decoded=true`); corrupt images
    * and audio/video fall back to the deterministic stub (`decoded=false`) —
    * a bad sample degrades, it never fails the scan. Output keeps lineage
    * columns + features.
    */
  def extractFeatures(assets: DataFrame, dim: Int = 16): DataFrame = {
    val enc = Encoders.product[Extracted]
    assets
      .select(col("asset_id"), col("kind"), col("bytes"))
      .mapPartitions { rows =>
        // per-partition decoder state initializes here (ImageIO SPI warms on
        // first decode; an audio/video codec handle would open here too)
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("bytes")
          val id    = r.getAs[Long]("asset_id")
          val kind  = r.getAs[String]("kind")
          val n     = if (bytes == null) 0 else bytes.length
          val img   = if (kind == "image") decodeImage(bytes) else None
          img match {
            case Some(i) =>
              Extracted(id, kind, n, decoded = true,
                Some(i.getWidth), Some(i.getHeight), imageGridFeatures(i, dim))
            case None =>
              Extracted(id, kind, n, decoded = false, None, None, stubDecode(bytes, dim))
          }
        }
      }(enc)
      .toDF()
  }

  /** Frame sampling plumbing for video: one output row per sampled frame
    * offset. Pure column algebra (sequence + explode); the per-frame decode
    * would plug into [[extractFeatures]] downstream.
    */
  def sampleFrames(assets: DataFrame, everyMs: Long = 1000L): DataFrame =
    assets
      .filter(col("kind") === "video" && col("meta.duration_ms") > 0)
      .select(col("asset_id"),
        // clip spans [0, duration): sequence() is end-inclusive, so stop one
        // ms short or the last sample seeks past end-of-stream
        explode(sequence(lit(0L), col("meta.duration_ms") - 1, lit(everyMs))).as("frame_ms"))

  /** Partition sizing by payload bytes: repartition so each task handles about
    * `targetBytes` of media — the knob that keeps executor memory flat at
    * 100 TB regardless of row counts.
    */
  def repartitionByBytes(assets: DataFrame, targetBytes: Long = 128L << 20): DataFrame = {
    // coalesce OUTSIDE the sum: an empty frame sums to null (NPE on getLong)
    val total = assets
      .agg(coalesce(sum(coalesce(length(col("bytes")), lit(0))), lit(0L)))
      .head().getLong(0)
    val parts = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    assets.repartition(parts)
  }
}
