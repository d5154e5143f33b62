package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.plans.VectorExpressions

/** Dense-vector math over `array<float|double>` columns.
  *
  * Primary API delegates to native one-pass Catalyst expressions
  * ([[graft.plans.VectorExpressions]]) — `zip_with`/`aggregate` higher-order
  * functions evaluate interpreted (per-element lambda dispatch + boxing), and
  * `hyperplaneBucket` embedded one aggregate node PER PLANE, i.e. nbits
  * interpreted array traversals per row in the bucket-assignment scan. The
  * `*Columns` twins keep the original column-algebra formulations as the
  * executable spec: parity tests (VectorParitySpec) pin the native results
  * bit-identical on every edge (nulls, length mismatch, zero vectors).
  */
object VectorFunctions {

  // The COLUMN TWINS still cast to array<double> (zip_with needs one element
  // type); the native expressions are float-native and must NOT be handed a
  // cast — an analyzer cast(... as array<double>) allocates and converts a
  // fresh array per row on each side of every candidate join (measured: the
  // dominant cost of q_ann_batch at sf1). Float→double widening inside the
  // native read is exact, so parity with the casting twins is preserved.
  private def d(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column = VectorExpressions.dot(a, b)

  /** Column-algebra twin of [[dot]] (interpreted HOFs; parity-test spec). */
  def dotColumns(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Left-fold element sum; native twin of `aggregate(v, 0.0, _ + _)`. */
  def arraySum(a: Column): Column = VectorExpressions.arraySum(a)

  /** Zero-guarded: a zero vector scores 0.0, not NaN (NaN sorts ABOVE every
    * double in Spark and would top every desc-score ranking). One fused pass
    * per pair — this is the inner loop of every ANN candidate scoring join.
    */
  def cosine(a: Column, b: Column): Column = VectorExpressions.cosine(a, b)

  /** Column-algebra twin of [[cosine]] (the original formulation whose IEEE
    * operation order the native expression replicates exactly).
    */
  def cosineColumns(a: Column, b: Column): Column = {
    val denom = sqrt(dotColumns(a, a)) * sqrt(dotColumns(b, b))
    when(denom === 0.0, lit(0.0)).otherwise(dotColumns(a, b) / denom)
  }

  /** Deterministic ±1 hyperplane components drawn from `seed` — shared by the
    * native expression and the column twin so both see identical planes.
    */
  private[graft] def planesFor(dim: Int, nbits: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nbits, dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** Signature of `nbits` random-hyperplane sign bits as an int bucket id —
    * all bits in ONE native pass over the vector.
    */
  def hyperplaneBucket(vec: Column, dim: Int, nbits: Int = 8, seed: Long = 7L): Column = {
    val planes = planesFor(dim, nbits, seed)
    val bucket = VectorExpressions.hyperplaneBits(vec, planes.map(_.toSeq).toSeq)
    // A dim mismatch would silently collapse ALL vectors into bucket 0 — the
    // exact all-pairs blowup bucketing exists to prevent. Fail loudly instead.
    when(size(vec) === dim, bucket)
      .otherwise(raise_error(concat(
        lit(s"hyperplaneBucket: expected $dim dims, got "), size(vec).cast("string"))))
  }

  /** Column-algebra twin of [[hyperplaneBucket]]'s bit computation (nbits
    * interpreted aggregate nodes; parity-test spec). Same planes, same guard.
    */
  def hyperplaneBucketColumns(vec: Column, dim: Int, nbits: Int = 8, seed: Long = 7L): Column = {
    val planes = planesFor(dim, nbits, seed)
    val bucket = (0 until nbits).map { p =>
      val proj = dotColumns(vec, typedLit(planes(p).toSeq))
      when(proj > 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)
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
