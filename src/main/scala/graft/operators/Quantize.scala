package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 embedding quantization — the storage-scale path for a 100 TB
  * embedding store: symmetric per-vector scalar quantization maps each
  * `array<float>` (4 bytes/dim) to `array<tinyint>` + one double scale
  * (~1 byte/dim — a 3.5-4× footprint cut on the largest column in a
  * training-data lake; FAISS's SQ8, the standard first rung before PQ).
  *
  *   scale    = max_i |x_i| / 127        (0 for the zero vector)
  *   codes_i  = round(x_i / scale)       (half away from zero, so both
  *                                        Spark's and DuckDB's `round`
  *                                        reproduce it — no clamp needed:
  *                                        the max maps to exactly ±127)
  *   x̂_i     = codes_i · scale
  *
  * The whole encode is ONE native scan-stage expression
  * ([[graft.plans.VectorExpressions.quantize8]] — codegen'd, float-native,
  * no per-row array cast); decode is columnar (`transform` over a
  * tinyint array — cheap, and decode sites are usually fused into a
  * downstream score anyway). Both directions are pure per-row state:
  * zero exchanges, embarrassingly parallel at any scale.
  */
object Quantize {

  /** `docs` + `(scale double, codes array<tinyint>)`. */
  def quantize(emb: DataFrame, vecCol: String = "embedding"): DataFrame = {
    require(emb.columns.contains(vecCol), s"Quantize: input has no '$vecCol' column")
    Seq("scale", "codes").foreach(c => require(!emb.columns.contains(c),
      s"Quantize: input already has a '$c' column — rename it first"))
    emb.withColumn("__q", graft.plans.VectorExpressions.quantize8(col(vecCol)))
      .withColumn("scale", col("__q.scale"))
      .withColumn("codes", col("__q.codes"))
      .drop("__q")
  }

  /** Reconstructed `array<double>` from codes + scale. */
  def dequantizeCol(codes: Column, scale: Column): Column =
    transform(codes, c => c.cast("double") * scale)

  /** Columnar twin of the native encode (parity-pinned in QuantizeSpec):
    * same max-abs scale, same half-away rounding via Spark's own `round`.
    */
  def quantize8Columnar(vec: Column): Column = {
    val d = vec.cast("array<double>")
    val scale = array_max(transform(d, abs(_))) / lit(127.0)
    struct(
      scale.as("scale"),
      when(scale === 0.0, transform(d, _ => lit(0).cast("byte")))
        .otherwise(transform(d, x => round(x / scale, 0).cast("byte")))
        .as("codes"))
  }

  /** Per-vector reconstruction audit — the demo/oracle shape: scale and
    * the max absolute reconstruction error (both rounded 6dp for
    * cross-engine hashing), the code sum and nonzero count (exact ints).
    * Theoretical bound: max_err ≤ scale/2 (half a quantization step).
    * One native scan-stage expression ([[graft.plans.VectorExpressions
    * .sq8Stats]]); [[reconstructionStatsColumnar]] keeps the HOF
    * formulation it replaced as the bit-parity twin (QuantizeSpec).
    */
  def reconstructionStats(emb: DataFrame, idCol: String = "vec_id",
                          vecCol: String = "embedding"): DataFrame = {
    require(emb.columns.contains(idCol), s"Quantize: input has no '$idCol' column")
    emb.filter(col(vecCol).isNotNull)
      .select(col(idCol), graft.plans.VectorExpressions.sq8Stats(col(vecCol)).as("__s"))
      .select(
        col(idCol),
        round(col("__s.scale"), 6).as("scale_r"),
        col("__s.sum_codes").as("sum_codes"),
        col("__s.nz").as("nz"),
        round(col("__s.max_err"), 6).as("max_err_r"))
      .orderBy(col(idCol))
  }

  /** The interpreted higher-order-function formulation of
    * [[reconstructionStats]] — three lambda passes + three intermediate
    * arrays per row. Kept ONLY as the parity twin: QuantizeSpec pins the
    * fused native expression against it bitwise.
    */
  private[operators] def reconstructionStatsColumnar(emb: DataFrame, idCol: String = "vec_id",
                          vecCol: String = "embedding"): DataFrame = {
    require(emb.columns.contains(idCol), s"Quantize: input has no '$idCol' column")
    val q = quantize(emb.filter(col(vecCol).isNotNull), vecCol)
    q.select(col(idCol), col("scale"), col("codes"),
        col(vecCol).cast("array<double>").as("__d"))
      .withColumn("__err",
        zip_with(col("codes"), col("__d"),
          (c, x) => abs(c.cast("double") * col("scale") - x)))
      .select(
        col(idCol),
        round(col("scale"), 6).as("scale_r"),
        aggregate(col("codes"), lit(0L), (acc, c) => acc + c.cast("long"))
          .as("sum_codes"),
        size(filter(col("codes"), _ =!= 0)).as("nz"),
        round(array_max(col("__err")), 6).as("max_err_r"))
      .orderBy(col(idCol))
  }
}
