package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs: Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(31L)
    (0L until 60L).map(i => (i, Seq.fill(16)(rnd.nextGaussian().toFloat))) :+
      (100L, Seq.fill(16)(0.0f)) :+                      // zero vector
      (101L, Seq.tabulate(16)(d => (d - 8).toFloat))     // exact ints incl. negatives
  }
  private lazy val emb = vecs.toDF("vec_id", "embedding")

  test("native encode matches the columnar twin bit-for-bit") {
    val got = emb.select(col("vec_id"),
        graft.plans.VectorExpressions.quantize8(col("embedding")).as("n"),
        Quantize.quantize8Columnar(col("embedding")).as("t"))
      .collect()
    got.foreach { r =>
      val n = r.getStruct(1); val t = r.getStruct(2)
      assert(java.lang.Double.doubleToLongBits(n.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(t.getDouble(0)), s"scale differs for ${r.getLong(0)}")
      assert(n.getSeq[Byte](1) == t.getSeq[Byte](1), s"codes differ for ${r.getLong(0)}")
    }
  }

  test("round trip: max element hits ±127, error bounded by half a step") {
    val rows = Quantize.quantize(emb)
      .withColumn("deq", Quantize.dequantizeCol(col("codes"), col("scale")))
      .collect()
    rows.foreach { r =>
      val x = r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble)
      val scale = r.getDouble(r.fieldIndex("scale"))
      val codes = r.getSeq[Byte](r.fieldIndex("codes"))
      val deq = r.getSeq[Double](r.fieldIndex("deq"))
      assert(codes.forall(c => c >= -127 && c <= 127))
      if (x.exists(_ != 0.0)) {
        assert(codes.map(c => math.abs(c.toInt)).max == 127, "max element must map to ±127")
        val maxErr = x.zip(deq).map { case (a, b) => math.abs(a - b) }.max
        assert(maxErr <= scale / 2 + 1e-12, s"err $maxErr above half-step ${scale / 2}")
      } else assert(scale == 0.0 && codes.forall(_ == 0))
    }
  }

  test("negative half-ties round AWAY from zero (the Spark/DuckDB round rule)") {
    // scale = 127/127 = 1 exactly; element -2.5 must code to -3, not -2
    val v = Seq((1L, Seq(127.0f, -2.5f, 2.5f, 0.0f)))
    val codes = v.toDF("vec_id", "embedding")
      .select(graft.plans.VectorExpressions.quantize8(col("embedding")).getField("codes"))
      .head().getSeq[Byte](0)
    assert(codes == Seq[Byte](127, -3, 3, 0), s"got $codes")
  }

  test("reconstruction stats shape and zero-vector row") {
    val stats = Quantize.reconstructionStats(emb).collect()
    assert(stats.length == vecs.length)
    val zero = stats.find(_.getLong(0) == 100L).get
    assert(zero.getDouble(1) == 0.0 && zero.getLong(2) == 0L && zero.getInt(3) == 0
      && zero.getDouble(4) == 0.0)
    // exact-integer vector: scale (8/127) reconstructs with tiny error
    val ints = stats.find(_.getLong(0) == 101L).get
    assert(ints.getDouble(4) <= ints.getDouble(1) / 2 + 1e-9)
  }

  test("fused native recon stats match the HOF columnar formulation bit-for-bit") {
    // the shipped reconstructionStats is the one-pass Int8ReconStats
    // expression; the interpreted aggregate/filter/zip_with formulation it
    // replaced is kept as the twin — every column must match bitwise,
    // including a null-embedding row being filtered and doubles by bits
    val withNull = emb.unionByName(
      Seq((999L, null.asInstanceOf[Seq[Float]])).toDF("vec_id", "embedding"))
    val got  = Quantize.reconstructionStats(withNull).collect()
    val twin = Quantize.reconstructionStatsColumnar(withNull).collect()
    assert(got.length == twin.length && got.length == vecs.length)
    got.zip(twin).foreach { case (g, t) =>
      assert(g.getLong(0) == t.getLong(0))
      assert(java.lang.Double.doubleToLongBits(g.getDouble(1)) ==
             java.lang.Double.doubleToLongBits(t.getDouble(1)), s"scale_r ${g.getLong(0)}")
      assert(g.getLong(2) == t.getLong(2), s"sum_codes ${g.getLong(0)}")
      assert(g.getInt(3) == t.getInt(3), s"nz ${g.getLong(0)}")
      assert(java.lang.Double.doubleToLongBits(g.getDouble(4)) ==
             java.lang.Double.doubleToLongBits(t.getDouble(4)), s"max_err_r ${g.getLong(0)}")
    }
    // empty vector: max_err is null in both forms (array_max of empty)
    val empty = Seq((7L, Seq.empty[Float])).toDF("vec_id", "embedding")
    val ge = Quantize.reconstructionStats(empty).head()
    val te = Quantize.reconstructionStatsColumnar(empty).head()
    assert(ge.isNullAt(4) && te.isNullAt(4))
    assert(ge.getDouble(1) == 0.0 && ge.getLong(2) == 0L && ge.getInt(3) == 0)
  }

  test("tie-adjacent doubles round like BigDecimal/DuckDB, not floor(y+0.5)") {
    // 0.49999999999999994 is the largest double below 0.5: floor(y + 0.5)
    // computes floor(1.0) = 1 (the FP addition crosses the tie), while
    // BigDecimal HALF_UP (Spark round) and C round (DuckDB) both give 0.
    // scale = 127/127 = 1 exactly, so y = x verbatim.
    val v = Seq((1L, Seq(127.0, 0.49999999999999994, -0.49999999999999994, 0.5, -0.5)))
    val row = v.toDF("vec_id", "embedding")
      .select(graft.plans.VectorExpressions.quantize8(col("embedding")).as("q"),
        Quantize.quantize8Columnar(col("embedding")).as("t"))
      .head()
    val native = row.getStruct(0).getSeq[Byte](1)
    val twin = row.getStruct(1).getSeq[Byte](1)
    assert(native == Seq[Byte](127, 0, 0, 1, -1), s"native got $native")
    assert(native == twin, s"twin diverged: $twin")
  }

  test("NaN and Infinity elements throw loudly (oracle would hard-error)") {
    for (bad <- Seq(Float.NaN, Float.PositiveInfinity, Float.NegativeInfinity)) {
      val df = Seq((1L, Seq(1.0f, bad))).toDF("vec_id", "embedding")
      val e = intercept[Exception](
        df.select(graft.plans.VectorExpressions.quantize8(col("embedding"))).collect())
      assert(e.getMessage != null)
    }
  }

  test("null element throws loudly; guards fire") {
    val bad = Seq((1L, Seq[java.lang.Float](1.0f, null))).toDF("vec_id", "embedding")
    val e = intercept[Exception](
      bad.select(graft.plans.VectorExpressions.quantize8(col("embedding"))).collect())
    assert(e.getMessage != null)
    intercept[IllegalArgumentException](
      Quantize.quantize(emb.withColumnRenamed("embedding", "x")))
    intercept[IllegalArgumentException](
      Quantize.quantize(emb.withColumn("codes", lit(1))))
  }
}
