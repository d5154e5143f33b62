package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines: image/audio/video
  * travel as opaque `binary` columns with typed metadata; decode / feature
  * extraction runs batch-shaped on executors.
  *
  * The decode step is STUBBED deterministically (no imaging/audio libraries in
  * this environment — see the builder brief): [[stubDecode]] derives fake but
  * stable "pixels"/features from the byte content. Everything AROUND the stub
  * is the real 100 TB plumbing: the schema contract, the batched
  * `mapPartitions` shape (one model/codec init per partition, not per row —
  * the Scala analogue of `mapInPandas`), and partition sizing by byte budget.
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

  /** Deterministic decode stub: a real implementation would call the codec
    * here (JNI/FFI), one codec instance per partition. Returns a fixed-length
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

  private case class Extracted(asset_id: Long, kind: String, n_bytes: Int, features: Array[Float])

  /** Batch-shaped feature extraction: `mapPartitions` so decoder init happens
    * once per partition (the expensive part for real codecs), rows stream
    * through without per-row setup. Output keeps lineage columns + features.
    */
  def extractFeatures(assets: DataFrame, dim: Int = 16): DataFrame = {
    val enc = Encoders.product[Extracted]
    assets
      .select(col("asset_id"), col("kind"), col("bytes"))
      .mapPartitions { rows =>
        // init per-partition decoder state here (stubbed)
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("bytes")
          Extracted(
            r.getAs[Long]("asset_id"),
            r.getAs[String]("kind"),
            if (bytes == null) 0 else bytes.length,
            stubDecode(bytes, dim))
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
