package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.SparkSpec
import graft.functions.{VectorFunctions => V}

/** Pins the native vector expressions bit-identical to their column-algebra
  * twins — the twins are the executable spec whose IEEE operation order the
  * natives must replicate (q_ann_bruteforce / q_embed_centroid oracle hashes
  * ride on it).
  */
class VectorParitySpec extends SparkSpec {
  import testImplicits._

  private lazy val testImplicits = spark.implicits

  private def bitsEq(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (x: java.lang.Double, y: java.lang.Double) =>
      java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y)
    case (x, y) => x == y
  }

  private def assertParity(rows: Seq[Row]): Unit = rows.foreach { r =>
    assert(bitsEq(r.get(0), r.get(1)), s"native ${r.get(0)} != twin ${r.get(1)} (row $r)")
  }

  test("cosine/dot/arraySum native == twin bit-for-bit on random float vectors") {
    val rnd = new scala.util.Random(11)
    val dim = 16
    val df = (0 until 200).map { _ =>
      (Array.fill(dim)(rnd.nextFloat()), Array.fill(dim)(rnd.nextFloat() - 0.5f))
    }.toDF("a", "b")
    assertParity(df.select(V.cosine(col("a"), col("b")), V.cosineColumns(col("a"), col("b"))).collect())
    assertParity(df.select(V.dot(col("a"), col("b")), V.dotColumns(col("a"), col("b"))).collect())
    assertParity(df.select(V.arraySum(col("a")),
      aggregate(col("a").cast("array<double>"), lit(0.0), (acc, x) => acc + x)).collect())
  }

  test("cosine edges: zero vector, empty, length mismatch, null element, null array") {
    val df = Seq(
      (Array(0.0, 0.0), Array(1.0, 2.0)),             // zero vector → 0.0
      (Array.empty[Double], Array.empty[Double]),     // empty → denom 0 → 0.0
      (Array(1.0, 2.0), Array(1.0, 2.0, 3.0)),        // mismatch → null
      (Array(0.0, 0.0), Array(1.0, 2.0, 3.0))         // mismatch + zero → 0.0 (denom wins)
    ).toDF("a", "b")
    assertParity(df.select(V.cosine(col("a"), col("b")), V.cosineColumns(col("a"), col("b"))).collect())

    val withNulls = spark.sql(
      """SELECT array(1.0d, cast(null as double)) AS a, array(1.0d, 2.0d) AS b
         UNION ALL SELECT cast(null as array<double>), array(1.0d, 2.0d)""")
    assertParity(withNulls.select(V.cosine(col("a"), col("b")), V.cosineColumns(col("a"), col("b"))).collect())
    assertParity(withNulls.select(V.dot(col("a"), col("b")), V.dotColumns(col("a"), col("b"))).collect())
    assertParity(withNulls.select(V.arraySum(col("a")),
      aggregate(col("a"), lit(0.0), (acc, x) => acc + x)).collect())
  }

  test("hyperplaneBucket native == twin on random vectors; null element → bucket 0") {
    val rnd = new scala.util.Random(23)
    val dim = 24
    val df = (0 until 300).map(_ => Tuple1(Array.fill(dim)(rnd.nextGaussian().toFloat))).toDF("v")
    assertParity(df.select(V.hyperplaneBucket(col("v"), dim, nbits = 10, seed = 5L),
      V.hyperplaneBucketColumns(col("v"), dim, nbits = 10, seed = 5L)).collect())

    // a null ELEMENT null-poisons every projection → bucket 0 in both paths
    val withNull = spark.sql("SELECT array(1.0d, cast(null as double), 3.0d) AS v")
    assertParity(withNull.select(V.hyperplaneBucket(col("v"), 3, 4, 5L),
      V.hyperplaneBucketColumns(col("v"), 3, 4, 5L)).collect())
    assert(withNull.select(V.hyperplaneBucket(col("v"), 3, 4, 5L)).head.getInt(0) == 0)
  }

  test("hyperplaneBucket dim mismatch raises in both paths") {
    val df = Seq(Tuple1(Array(1.0, 2.0))).toDF("v")
    val eNative = intercept[Exception](df.select(V.hyperplaneBucket(col("v"), 3)).collect())
    val eTwin   = intercept[Exception](df.select(V.hyperplaneBucketColumns(col("v"), 3)).collect())
    assert(eNative.getMessage.contains("expected 3 dims, got 2") ||
      eNative.getCause.getMessage.contains("expected 3 dims, got 2"))
    assert(eTwin.getMessage.contains("expected 3 dims, got 2") ||
      eTwin.getCause.getMessage.contains("expected 3 dims, got 2"))
  }

  test("NaN propagates identically (NaN denom is not zero → NaN score)") {
    val df = Seq((Array(Double.NaN, 1.0), Array(1.0, 2.0))).toDF("a", "b")
    assertParity(df.select(V.cosine(col("a"), col("b")), V.cosineColumns(col("a"), col("b"))).collect())
    assert(df.select(V.cosine(col("a"), col("b"))).head.getDouble(0).isNaN)
  }
}
