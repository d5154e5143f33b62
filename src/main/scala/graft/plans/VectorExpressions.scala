package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the dense-vector hot path.
  *
  * The `zip_with`/`aggregate` formulations (graft.functions.VectorFunctions'
  * column twins) are correct but evaluate through interpreted higher-order
  * functions — every pair-scoring cosine pays per-element lambda dispatch and
  * boxing, and the hyperplane signature pays it `nbits` times (one
  * ArrayAggregate node per plane). In the ANN candidate-scoring join and the
  * bucket-assignment scan those are THE inner loops at 100 TB. These
  * expressions do each job in one tight primitive pass per row.
  *
  * Two properties make them join-hot-path safe (round-8 fix — the earlier
  * double-array-only CodegenFallback versions cost q_ann_batch 12 s at sf1):
  *
  *  - FLOAT-NATIVE: `array<float>` (the actual embeddings type) is accepted
  *    directly and read element-wise with an exact float→double widen — the
  *    old signature forced an analyzer `cast(... as array<double>)` that
  *    allocated and converted a fresh 64-element array PER JOINED ROW on
  *    both sides of every candidate join.
  *  - REAL CODEGEN: `doGenCode` emits a call to the same static scorer the
  *    interpreted path uses, so a Project containing these no longer drops
  *    its whole stage out of whole-stage codegen (CodegenFallback poisons
  *    the operator, turning a BroadcastNestedLoopJoin + score projection
  *    into fully interpreted row processing).
  *
  * Bit parity with the twins is load-bearing (q_ann_bruteforce and
  * q_embed_centroid are oracle-hash-checked): every accumulator folds in the
  * same index order and applies the same IEEE operations as the column
  * algebra it replaces (float→double widening is exact, so reading floats
  * directly equals casting the array first), and the interpreted and
  * generated paths share one scorer each. Null/mismatch semantics replicate
  * `zip_with`'s null-padding exactly — see each expression's note.
  */
object VectorExpressions {

  /** Sum of element products folded left in index order (native twin of
    * `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)`). Twin semantics kept:
    * a length mismatch (zip_with null-pads the shorter side) or any null
    * element null-poisons the fold → null.
    */
  def dot(a: Column, b: Column): Column =
    ColumnShim.column(DotProduct(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Fused one-pass cosine (native twin of VectorFunctions.cosineColumns):
    * dot + both norms in a single traversal, then the identical
    * `when(denom === 0.0, 0.0).otherwise(dot / denom)` decision.
    */
  def cosine(a: Column, b: Column): Column =
    ColumnShim.column(CosineSim(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Left-fold element sum (native twin of `aggregate(v, 0.0, _ + _)`);
    * null element → null like the fold it replaces.
    */
  def arraySum(a: Column): Column =
    ColumnShim.column(ArraySumFold(ColumnShim.expression(a)))

  /** All `nbits` hyperplane sign bits in ONE pass over the vector (the twin
    * builds `nbits` separate interpreted aggregate nodes). Callers keep the
    * dim-guard + raise_error in column algebra (VectorFunctions).
    */
  def hyperplaneBits(vec: Column, planes: Seq[Seq[Double]]): Column =
    ColumnShim.column(HyperplaneBits(ColumnShim.expression(vec), planes))

  /** Index of the nearest center by squared Euclidean distance (ties →
    * lower index) — the IVF cell-assignment scan. One tight primitive pass
    * per row over all centers; a dim mismatch or null element throws (an
    * assignment silently landing in cell 0 would quietly break dedup
    * recall, the same policy MLlib's transform applies).
    */
  def nearestCenter(vec: Column, centers: Seq[Seq[Double]]): Column =
    ColumnShim.column(NearestCenter(ColumnShim.expression(vec), centers))

  /** Symmetric per-vector int8 scalar quantization in ONE pass:
    * `struct<scale double, codes array<tinyint>>` with
    * `scale = max|x| / 127` and `codes[i] = round(x[i] / scale)` (half
    * away from zero — the rounding BOTH Spark's `round` and DuckDB/C
    * `round` apply, so the columnar twin and the SQL oracle match
    * bit-for-bit; `math.round`'s floor(x+0.5) would diverge on negative
    * ties). A zero vector quantizes to scale 0 with all-zero codes; a
    * null element throws like [[nearestCenter]] (a silently-zeroed
    * dimension would corrupt every downstream distance).
    */
  def quantize8(vec: Column): Column =
    ColumnShim.column(Int8Quantize(ColumnShim.expression(vec)))

  /** float or double arrays, no cast for either; anything else coerces to
    * double arrays (ImplicitCastInputTypes) so the SQL surface keeps taking
    * e.g. int arrays. TypeCollection is private[sql] → shimmed.
    */
  private[plans] val vecType = ColumnShim.vecArrayInput

  private[plans] def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Element read shared by every scorer: exact widen for floats. */
  @inline private[plans] def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
}

object DotProduct {
  /** One scorer for BOTH the interpreted and generated paths. Boxed null =
    * null result (mismatch or null element — the zip_with twin's semantics).
    */
  def compute(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): java.lang.Double = {
    val la = a.numElements()
    if (la != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < la) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += VectorExpressions.elem(a, i, aF) * VectorExpressions.elem(b, i, bF)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(VectorExpressions.vecType, VectorExpressions.vecType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  @transient private lazy val aF = VectorExpressions.isFloatArray(left)
  @transient private lazy val bF = VectorExpressions.isFloatArray(right)

  override def nullSafeEval(l: Any, r: Any): Any =
    DotProduct.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], aF, bF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotRes")
      s"""
         |java.lang.Double $r = graft.plans.DotProduct$$.MODULE$$.compute($a, $b, $aF, $bF);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** One fused pass: three independent accumulators, each folding in index
    * order — the same IEEE sequence as the twin's three separate folds.
    * ANY null element → null overall in the twin (a null norm nulls the
    * denom and its side's dot simultaneously), so we can return early.
    * The twin decides `when(denom === 0.0, 0.0)` FIRST — a zero vector
    * scores 0.0 even against a mismatched-length partner (whose dot would
    * be null).
    */
  def compute(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): java.lang.Double = {
    val la = a.numElements()
    val lb = b.numElements()
    var accAA = 0.0
    var accBB = 0.0
    var accAB = 0.0
    val n = math.max(la, lb)
    var i = 0
    while (i < n) {
      val inA = i < la
      val inB = i < lb
      if ((inA && a.isNullAt(i)) || (inB && b.isNullAt(i))) return null
      var x = 0.0
      var y = 0.0
      if (inA) { x = VectorExpressions.elem(a, i, aF); accAA += x * x }
      if (inB) { y = VectorExpressions.elem(b, i, bF); accBB += y * y }
      if (inA && inB) accAB += x * y
      i += 1
    }
    val denom = math.sqrt(accAA) * math.sqrt(accBB)
    if (denom == 0.0) java.lang.Double.valueOf(0.0)
    else if (la != lb) null
    else java.lang.Double.valueOf(accAB / denom)
  }
}

/** ImplicitCastInputTypes (not bare ExpectsInputTypes) so the SQL surface
  * (`graft_cosine`) accepts any numeric array by analyzer-inserted cast —
  * while float and double arrays (the actual embedding types) pass through
  * uncast and are read natively.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(VectorExpressions.vecType, VectorExpressions.vecType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  @transient private lazy val aF = VectorExpressions.isFloatArray(left)
  @transient private lazy val bF = VectorExpressions.isFloatArray(right)

  override def nullSafeEval(l: Any, r: Any): Any =
    CosineSim.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], aF, bF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("cosRes")
      s"""
         |java.lang.Double $r = graft.plans.CosineSim$$.MODULE$$.compute($a, $b, $aF, $bF);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArraySumFold {
  def compute(a: ArrayData, aF: Boolean): java.lang.Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      acc += VectorExpressions.elem(a, i, aF)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

case class ArraySumFold(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(VectorExpressions.vecType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  @transient private lazy val aF = VectorExpressions.isFloatArray(child)

  override def nullSafeEval(input: Any): Any =
    ArraySumFold.compute(input.asInstanceOf[ArrayData], aF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("sumRes")
      s"""
         |java.lang.Double $r = graft.plans.ArraySumFold$$.MODULE$$.compute($a, $aF);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBits {
  /** Twin semantics: a length mismatch or null element null-poisons every
    * projection, and `when(proj > 0, bit).otherwise(0)` maps a null proj to
    * 0 — so such vectors land in bucket 0. (Callers guard real mismatches
    * with raise_error in column algebra before this expression runs.)
    * Never null, so the return is a primitive.
    */
  def compute(arr: ArrayData, p: Array[Array[Double]], aF: Boolean): Int = {
    val n = arr.numElements()
    val dim = if (p.length == 0) 0 else p(0).length
    if (n != dim) return 0
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return 0
      v(i) = VectorExpressions.elem(arr, i, aF)
      i += 1
    }
    var bucket = 0
    var pi = 0
    while (pi < p.length) {
      val pl = p(pi)
      var acc = 0.0
      var j = 0
      while (j < n) { acc += v(j) * pl(j); j += 1 }
      if (acc > 0) bucket |= 1 << pi
      pi += 1
    }
    bucket
  }
}

object NearestCenter {
  def compute(arr: ArrayData, centers: Array[Array[Double]], aF: Boolean): Int = {
    val n = arr.numElements()
    require(centers.length > 0 && centers(0).length == n,
      s"graft.NearestCenter: vector has $n dims but the quantizer was trained with ${if (centers.isEmpty) 0 else centers(0).length}")
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      require(!arr.isNullAt(i), "graft.NearestCenter: vector has a null element")
      v(i) = VectorExpressions.elem(arr, i, aF)
      i += 1
    }
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < centers.length) {
      val ctr = centers(c)
      var acc = 0.0
      var j = 0
      while (j < n && acc < bestD) { val d = v(j) - ctr(j); acc += d * d; j += 1 }
      if (acc < bestD) { bestD = acc; best = c }
      c += 1
    }
    best
  }
}

case class NearestCenter(child: Expression, centers: Seq[Seq[Double]])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(VectorExpressions.vecType)
  override def dataType: DataType = IntegerType

  @transient private lazy val c: Array[Array[Double]] = centers.map(_.toArray).toArray
  @transient private lazy val aF = VectorExpressions.isFloatArray(child)

  override def nullSafeEval(input: Any): Any =
    Integer.valueOf(NearestCenter.compute(input.asInstanceOf[ArrayData], c, aF))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centers", c, "double[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.NearestCenter$$.MODULE$$.compute($a, $cRef, $aF);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class HyperplaneBits(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(VectorExpressions.vecType)
  override def dataType: DataType = IntegerType

  @transient private lazy val p: Array[Array[Double]] = planes.map(_.toArray).toArray
  @transient private lazy val aF = VectorExpressions.isFloatArray(child)

  override def nullSafeEval(input: Any): Any =
    Integer.valueOf(HyperplaneBits.compute(input.asInstanceOf[ArrayData], p, aF))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("planes", p, "double[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.HyperplaneBits$$.MODULE$$.compute($a, $pRef, $aF);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Int8Quantize {
  /** One scorer for both paths. Half-away-from-zero rounding (ties at
    * ±k.5 round AWAY), matching BigDecimal HALF_UP (Spark round) and C
    * round (DuckDB) EXACTLY: the fractional part is compared to 0.5
    * directly — `floor(y + 0.5)` would round UP across a tie for the
    * largest double below k.5 (the FP addition lands on k+1.0), where
    * both reference rounds return k. `|y| - floor(|y|)` is exact in
    * IEEE754 (the fractional bits of a double survive subtracting its
    * integer part), so the comparison has no error of its own.
    * |x/scale| ≤ 127 by construction of scale, so no clamp is needed:
    * the max element maps to exactly ±127. NaN/Infinity elements are
    * rejected like nulls — the columnar twin would NaN-poison the scale
    * and the SQL oracle hard-errors casting round(nan), so "throw
    * loudly" is the only behavior all three paths can share.
    */
  def compute(a: ArrayData, isFloat: Boolean): org.apache.spark.sql.catalyst.InternalRow = {
    val n = a.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      require(!a.isNullAt(i), "graft.Int8Quantize: null element in vector")
      val x = math.abs(VectorExpressions.elem(a, i, isFloat))
      require(!java.lang.Double.isNaN(x) && !java.lang.Double.isInfinite(x),
        "graft.Int8Quantize: non-finite element in vector")
      if (x > maxAbs) maxAbs = x
      i += 1
    }
    val scale = maxAbs / 127.0
    val codes = new Array[Byte](n)
    if (scale != 0.0) {
      i = 0
      while (i < n) {
        val y = VectorExpressions.elem(a, i, isFloat) / scale
        val ay = math.abs(y)
        val f = math.floor(ay)
        val r = if (ay - f >= 0.5) f + 1.0 else f
        codes(i) = (if (y >= 0) r else -r).toByte
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.InternalRow(scale,
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(codes))
  }
}

case class Int8Quantize(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(VectorExpressions.vecType)
  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("codes", ArrayType(ByteType, containsNull = false), nullable = false)))

  @transient private lazy val aF = VectorExpressions.isFloatArray(child)

  override def nullSafeEval(input: Any): Any =
    Int8Quantize.compute(input.asInstanceOf[ArrayData], aF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.Int8Quantize$$.MODULE$$.compute($a, $aF);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
