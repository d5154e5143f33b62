package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float|double>` columns via `zip_with` /
  * `aggregate` — per-row, codegen'd, shuffle-free. A custom Catalyst
  * Expression with `doGenCode` would shave the ArrayData boxing; these
  * compose identically and stay optimizer-visible, which matters more here.
  */
object VectorFunctions {

  private def d(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Zero-guarded: a zero vector scores 0.0, not NaN (NaN sorts ABOVE every
    * double in Spark and would top every desc-score ranking).
    */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** Signature of `nbits` random-hyperplane sign bits as an int bucket id.
    * Hyperplane components are deterministic ±1 draws from `seed`, embedded as
    * literals — every executor and every run sees identical planes.
    */
  def hyperplaneBucket(vec: Column, dim: Int, nbits: Int = 8, seed: Long = 7L): Column = {
    val rnd = new scala.util.Random(seed)
    val planes = Array.fill(nbits, dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
    val bucket = (0 until nbits).map { p =>
      val proj = dot(vec, typedLit(planes(p).toSeq))
      when(proj > 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)
    // A dim mismatch null-poisons every projection (zip_with pads with nulls)
    // and would silently collapse ALL vectors into bucket 0 — the exact
    // all-pairs blowup bucketing exists to prevent. Fail loudly instead.
    when(size(vec) === dim, bucket)
      .otherwise(raise_error(concat(
        lit(s"hyperplaneBucket: expected $dim dims, got "), size(vec).cast("string"))))
  }

  /** The bucket ids to probe for a query bucket: itself plus every 1-bit flip
    * (standard multiprobe LSH — recovers neighbors that fell just across one
    * hyperplane).
    */
  def probeBuckets(bucket: Column, nbits: Int): Column =
    array((Seq(bucket) ++ (0 until nbits).map(p => bucket.bitwiseXOR(lit(1 << p)))): _*)
}
