package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
  * Bit parity with the twins is load-bearing (q_ann_bruteforce and
  * q_embed_centroid are oracle-hash-checked): every accumulator folds in the
  * same index order and applies the same IEEE operations as the column
  * algebra it replaces, so results are bit-identical, not just close.
  * Null/mismatch semantics replicate `zip_with`'s null-padding exactly —
  * see each expression's note.
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
}

case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with ExpectsInputTypes {

  override def inputTypes = ColumnShim.doubleArrayInput2
  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val la = a.numElements()
    // zip_with pads a length mismatch with nulls; a null product nulls the
    // whole fold — so mismatch or any null element → null, same as the twin
    if (la != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < la) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** ImplicitCastInputTypes (not bare ExpectsInputTypes) so the SQL surface
  * (`graft_cosine`) accepts array<float> — the repo's actual embeddings
  * column type — by analyzer-inserted cast, matching the Scala API which
  * casts explicitly.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with ImplicitCastInputTypes {

  override def inputTypes = ColumnShim.doubleArrayInput2
  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val la = a.numElements()
    val lb = b.numElements()
    // One fused pass: three independent accumulators, each folding in index
    // order — the same IEEE sequence as the twin's three separate folds.
    // ANY null element → null overall in the twin (a null norm nulls the
    // denom and its side's dot simultaneously), so we can return early.
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
      if (inA) { x = a.getDouble(i); accAA += x * x }
      if (inB) { y = b.getDouble(i); accBB += y * y }
      if (inA && inB) accAB += x * y
      i += 1
    }
    val denom = math.sqrt(accAA) * math.sqrt(accBB)
    // twin decides `when(denom === 0.0, 0.0)` FIRST — a zero vector scores
    // 0.0 even against a mismatched-length partner (whose dot would be null)
    if (denom == 0.0) java.lang.Double.valueOf(0.0)
    else if (la != lb) null
    else java.lang.Double.valueOf(accAB / denom)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class ArraySumFold(child: Expression)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {

  override def inputTypes = ColumnShim.doubleArrayInput
  override def dataType: DataType = DoubleType

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      acc += a.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class HyperplaneBits(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {

  override def inputTypes = ColumnShim.doubleArrayInput
  override def dataType: DataType = IntegerType

  @transient private lazy val p: Array[Array[Double]] = planes.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val dim = if (p.length == 0) 0 else p(0).length
    // Twin semantics: a length mismatch or null element null-poisons every
    // projection, and `when(proj > 0, bit).otherwise(0)` maps a null proj to
    // 0 — so such vectors land in bucket 0. (Callers guard real mismatches
    // with raise_error in column algebra before this expression runs.)
    if (n != dim) return Integer.valueOf(0)
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return Integer.valueOf(0)
      v(i) = arr.getDouble(i)
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
    Integer.valueOf(bucket)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
