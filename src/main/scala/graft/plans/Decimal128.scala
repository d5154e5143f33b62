package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, BinaryExpression, Expression, ExpressionDescription, If, IsNull, Literal, QuaternaryExpression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, QuaternaryLike, TernaryLike, UnaryLike}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Fixed-point 128-bit money aggregation — `sum(cast(x as decimal(18,s)))`
  * re-done as primitive-long arithmetic, bit-equal to the decimal plan.
  *
  * WHY: the agg family's sums run at decimal(28,2)+ — past Spark's
  * compact-long threshold (18 digits), so every input row pays a
  * non-compact `Decimal` add: a java.math.BigDecimal allocation + add +
  * buffer write per row, which benchmarked 16-18x DuckDB's vectorized
  * int128 SUM at sf10 with an otherwise optimal plan (partial agg, one
  * exchange). The arithmetic constant, not the plan, was the gap.
  *
  * SHAPE: per row, [[DoubleToScaledLong]] converts the double to the
  * unscaled long of `cast(x as decimal(18,s))` (codegen'd, null-safe,
  * bit-equal to the Cast — see its note). [[Decimal128Sum]] then
  * accumulates those longs into a two-long (hi/lo) signed 128-bit buffer.
  * It is a DeclarativeAggregate over primitive LongType buffer slots — NOT
  * a TypedImperativeAggregate like TopKByScore — deliberately: declarative
  * primitive buffers run inside HashAggregateExec under whole-stage
  * codegen (TypedImperativeAggregate forces ObjectHashAggregateExec and an
  * object buffer), and the 128-bit add is expressible as three pure
  * long expressions. The partial-aggregate (map-side combine) shape is
  * unchanged — each slot merges with a wrapping add + carry.
  *
  * OVERFLOW: per-row addends are bounded by |unscaled| < 10^18 (the
  * decimal(18,s) cast nulls anything wider), so after n rows the true sum
  * satisfies |sum| < n*10^18. Signed-128 wrap needs |sum| >= 2^127 ~
  * 1.7e38, i.e. n > 1.7e20 input rows — more rows than a 64-bit row count
  * can address and ~six decades past 100 TB. Overflow is impossible by
  * construction rather than checked per row; the one checked operation is
  * [[ScaledLongMul]] (per-row product), which throws on 63-bit overflow
  * instead of silently diverging from the exact decimal product.
  *
  * RESULT: `(hi,lo)` is converted once per GROUP via BigDecimal, exactly
  * the value `cast(sum(decimal) as double)` produces (both are
  * correctly-rounded BigDecimal.doubleValue of the same exact rational).
  * All-null / empty input evaluates to null like `sum`.
  *
  * Parity with `sum(cast(x as decimal(18,s))).cast("double")` is pinned in
  * Decimal128Spec on randomized data including the double-vs-decimal
  * rounding traps (0.145-style shortest-repr cases, negatives, nulls).
  */
object Decimal128 {

  /** Unscaled long of `cast(c as decimal(18, scale))`; null where the cast
    * is null (null input, NaN/Infinity, >18-digit overflow).
    */
  def scaled(c: Column, scale: Int): Column =
    ColumnShim.column(DoubleToScaledLong(ColumnShim.expression(c), scale))

  /** Exact product of two unscaled longs (= decimal multiply of the values
    * at summed scales; decimal multiplication is exact). Throws on 63-bit
    * overflow — money magnitudes (<=1e10 unscaled at scale 2 x 1e4 at
    * scale 4) sit ~five decades below the limit.
    */
  def mul(a: Column, b: Column): Column =
    ColumnShim.column(ScaledLongMul(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** 128-bit sum of an unscaled-long column, evaluated to the double that
    * `sum(decimal(18+10, outScale)).cast("double")` yields.
    */
  def sum128(c: Column, outScale: Int): Column =
    ColumnShim.column(Decimal128Sum(ColumnShim.expression(c), outScale).toAggregateExpression())

  /** Drop-in for `sum(c.cast("decimal(18,s)")).cast("double")`. */
  def sumMoney(c: Column, scale: Int = 2): Column = sum128(scaled(c, scale), scale)

  /** Level-1 half of a TWO-LEVEL exact money sum: per-group 128-bit partial
    * state (`struct<hi,lo,isEmpty>` — [[Decimal128SumPartial]]). Combine the
    * group states with [[sumMoneyMerge]]; the merged double is bit-identical
    * to a one-level [[sumMoney]] over the same rows (128-bit adds are
    * associative; one double conversion at the very end — the same
    * partial/merge pair GroupingSetRules injects, equality pinned in
    * GroupingSetRulesSpec and Decimal128Spec). Use when an aggregation
    * pre-groups on a finer key and the exact total must survive the second
    * level — a plain `sum` over [[sumMoney]]'s per-group DOUBLES would
    * re-round at every add.
    */
  def sumMoneyPartial(c: Column, scale: Int = 2): Column =
    ColumnShim.column(Decimal128SumPartial(
      ColumnShim.expression(scaled(c, scale)), scale).toAggregateExpression())

  /** Level-2 half of the two-level exact money sum — see [[sumMoneyPartial]]. */
  def sumMoneyMerge(c: Column, scale: Int = 2): Column =
    ColumnShim.column(Decimal128SumMerge(
      ColumnShim.expression(c), scale).toAggregateExpression())

  // ---- static runtime (shared by eval and generated code) ----------------

  private val POW10: Array[Double] =
    (0 to 17).map(i => math.pow(10, i)).toArray // exact doubles through 10^15

  /** Unscaled long of `new BigDecimal(Double.toString(d)).setScale(s,
    * HALF_UP)` — i.e. Spark's Cast(double -> decimal(18,s)) value — or
    * null for NaN/Infinity/overflow (the Cast's non-ANSI null results).
    *
    * Fast path (no allocation, the codegen hot path): with p = 10^s exact,
    * m = rint(d*p), accept when |m| <= 2^40, m/p == d exactly, and
    * ulp(d)*p <= 0.25. Then d IS the double of the scale-s value m*10^-s;
    * the shortest round-trip string v* that Double.toString picks
    * satisfies |v* - d| <= ulp/2 and |m*10^-s - d| <= ulp/2 (both
    * round-trip to d), so |v* - m*10^-s| <= ulp <= 10^-s/4: m is v*'s
    * unique nearest scale-s multiple and never a .5 tie, hence
    * HALF_UP(v*, s) = m. The |m| bound keeps rint's candidate exact
    * (relative error 2^-51 * 2^40 << 0.5) and trivially within 18 digits.
    * Anything failing a condition takes the BigDecimal slow path.
    */
  def toScaledLong(d: Double, scale: Int): java.lang.Long = {
    val p = POW10(scale)
    val m = Math.rint(d * p)
    if (Math.abs(m) <= 1.0995116e12 /* 2^40 */ && m / p == d && Math.ulp(d) * p <= 0.25) {
      java.lang.Long.valueOf(m.toLong)
    } else slowScaledLong(d, scale)
  }

  /** Public only for generated code (the codegen fast path inlines the
    * primitive checks and falls back here).
    */
  def slowScaledLong(d: Double, scale: Int): java.lang.Long = {
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) return null
    val bd = new java.math.BigDecimal(java.lang.Double.toString(d))
      .setScale(scale, java.math.RoundingMode.HALF_UP)
    if (bd.precision > 18) null // decimal(18,s) cast overflow -> null
    else java.lang.Long.valueOf(bd.unscaledValue.longValue) // <=18 digits: fits
  }

  def mulExact(a: Long, b: Long): Long =
    try Math.multiplyExact(a, b)
    catch {
      case _: ArithmeticException => throw new ArithmeticException(
        s"graft Decimal128: per-row product $a * $b exceeds the 63-bit unscaled " +
          "range; sum these operands at a lower combined scale")
    }

  /** Carry-out of the unsigned add lo1 + lo2 (0 or 1). */
  def carry(lo1: Long, lo2: Long): Long = {
    val r = lo1 + lo2
    ((lo1 & lo2) | ((lo1 | lo2) & ~r)) >>> 63
  }

  /** New hi word after adding sign-extended x to (hi, lo). */
  def addHi(hi: Long, lo: Long, x: Long): Long = hi + (x >> 63) + carry(lo, x)

  /** New hi word after merging two 128-bit partials. */
  def mergeHi(hi1: Long, lo1: Long, hi2: Long, lo2: Long): Long =
    hi1 + hi2 + carry(lo1, lo2)

  /** The exact double of the signed-128 (hi,lo) at `scale` — same
    * correctly-rounded conversion as Decimal.toDouble on the summed
    * decimal. Once per group; clarity over speed.
    */
  def toDouble(hi: Long, lo: Long, scale: Int): Double = {
    val bi = java.math.BigInteger.valueOf(hi).shiftLeft(64)
      .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(lo)))
    new java.math.BigDecimal(bi, scale).doubleValue()
  }
}

/** See [[Decimal128.toScaledLong]]. Double -> nullable Long. */
case class DoubleToScaledLong(child: Expression, scale: Int)
    extends UnaryExpression with UnaryLike[Expression] {
  require(scale >= 0 && scale <= 15, s"scale $scale outside the exact-pow10 range")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes() =
    if (child.dataType == DoubleType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_scaled expects DOUBLE, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    Decimal128.toScaledLong(input.asInstanceOf[Double], scale)

  // The fast path (exact scale-s doubles — every money column) is inlined
  // primitively: no per-row boxing, branch-predictable, whole-stage-codegen
  // friendly. Only the slow path pays the allocating call.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => {
      val p = java.lang.Double.toString(math.pow(10, scale)) // exact for s<=15
      val m = ctx.freshName("scaledM")
      val r = ctx.freshName("scaledRes")
      s"""
         |double $m = Math.rint($d * $p);
         |if (Math.abs($m) <= 1.0995116e12 && $m / $p == $d && Math.ulp($d) * $p <= 0.25) {
         |  ${ev.value} = (long) $m;
         |} else {
         |  java.lang.Long $r = graft.plans.Decimal128$$.MODULE$$.slowScaledLong($d, $scale);
         |  if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Overflow-checked long multiply ([[Decimal128.mulExact]]): the exact
  * decimal product in unscaled form. Long x Long -> Long.
  */
case class ScaledLongMul(left: Expression, right: Expression)
    extends BinaryExpression with BinaryLike[Expression] {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "graft_scaled_mul expects (BIGINT, BIGINT)")

  override def nullSafeEval(a: Any, b: Any): Any =
    Decimal128.mulExact(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.Decimal128$$.MODULE$$.mulExact($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Wrapping long add — buffer-slot arithmetic that must wrap (the lo word
  * of a 128-bit add) regardless of the session's ANSI setting, which makes
  * the builtin Add unusable here.
  */
case class WrapAdd(left: Expression, right: Expression)
    extends BinaryExpression with BinaryLike[Expression] {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    a.asInstanceOf[Long] + b.asInstanceOf[Long]
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $a + $b;")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** hi' of (hi,lo) += sign-extend(x). (Long, Long, Long) -> Long. */
case class Int128AddHi(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with TernaryLike[Expression] {
  override def dataType: DataType = LongType
  override def nullSafeEval(hi: Any, lo: Any, x: Any): Any =
    Decimal128.addHi(hi.asInstanceOf[Long], lo.asInstanceOf[Long], x.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (hi, lo, x) =>
      s"${ev.value} = graft.plans.Decimal128$$.MODULE$$.addHi($hi, $lo, $x);")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** hi' of (hi1,lo1) += (hi2,lo2). (Long x4) -> Long. */
case class Int128MergeHi(first: Expression, second: Expression, third: Expression, fourth: Expression)
    extends QuaternaryExpression with QuaternaryLike[Expression] {
  override def dataType: DataType = LongType
  override def nullSafeEval(hi1: Any, lo1: Any, hi2: Any, lo2: Any): Any =
    Decimal128.mergeHi(hi1.asInstanceOf[Long], lo1.asInstanceOf[Long],
      hi2.asInstanceOf[Long], lo2.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) =>
      s"${ev.value} = graft.plans.Decimal128$$.MODULE$$.mergeHi($a, $b, $c, $d);")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

/** Final (hi,lo,scale) -> double conversion; once per group. */
case class Int128ToDouble(first: Expression, second: Expression, scale: Int)
    extends BinaryExpression with BinaryLike[Expression] {
  override def left: Expression = first
  override def right: Expression = second
  override def dataType: DataType = DoubleType
  override def nullSafeEval(hi: Any, lo: Any): Any =
    Decimal128.toDouble(hi.asInstanceOf[Long], lo.asInstanceOf[Long], scale)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (hi, lo) =>
      s"${ev.value} = graft.plans.Decimal128$$.MODULE$$.toDouble($hi, $lo, $scale);")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(first = newLeft, second = newRight)
}

/** The aggregate. Input: nullable unscaled LONG at `scale`; output: the
  * double `sum(decimal).cast("double")` yields, null on empty/all-null
  * input. Buffer: (hi: long, lo: long, isEmpty: boolean) — all primitive,
  * HashAggregateExec-compatible.
  */
case class Decimal128Sum(child: Expression, scale: Int)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes() =
    if (child.dataType == LongType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_sum128 expects an unscaled BIGINT input, got ${child.dataType.catalogString}")

  private lazy val hi = AttributeReference("hi128", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo128", LongType, nullable = false)()
  private lazy val empty = AttributeReference("isEmpty", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(hi, lo, empty)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(true))

  // All three slots read the OLD (hi, lo); a null input row leaves the
  // buffer untouched, exactly sum's skip-null semantics.
  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(child), hi, Int128AddHi(hi, lo, child)),
    If(IsNull(child), lo, WrapAdd(lo, child)),
    org.apache.spark.sql.catalyst.expressions.And(empty, IsNull(child)))

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Int128MergeHi(hi.left, lo.left, hi.right, lo.right),
    WrapAdd(lo.left, lo.right),
    org.apache.spark.sql.catalyst.expressions.And(empty.left, empty.right))

  override lazy val evaluateExpression: Expression =
    If(empty, Literal(null, DoubleType), Int128ToDouble(hi, lo, scale))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[Decimal128Sum]]'s exact two-phase decomposition, for optimizer rewrites
  * that re-aggregate group results across grouping sets
  * ([[PreAggregateGroupingSets]]): the pre-aggregate keeps the EXACT signed
  * 128-bit state per group instead of the per-group double, so re-summing
  * subtotals stays bit-equal to summing the raw rows — re-aggregating the
  * doubles would reintroduce the float-add rounding the whole Decimal128
  * layer exists to avoid.
  */
object Decimal128SumPartial {
  val resultType: StructType = StructType(Seq(
    StructField("hi128", LongType, nullable = false),
    StructField("lo128", LongType, nullable = false),
    StructField("isEmpty", BooleanType, nullable = false)))
}

/** Same accumulation as [[Decimal128Sum]]; evaluates to the raw
  * `struct(hi, lo, isEmpty)` state instead of the double. */
case class Decimal128SumPartial(child: Expression, scale: Int)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def dataType: DataType = Decimal128SumPartial.resultType
  override def nullable: Boolean = false
  override def checkInputDataTypes() =
    if (child.dataType == LongType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_sum128_partial expects an unscaled BIGINT input, got ${child.dataType.catalogString}")

  private lazy val hi = AttributeReference("hi128", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo128", LongType, nullable = false)()
  private lazy val empty = AttributeReference("isEmpty", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(hi, lo, empty)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(true))
  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(child), hi, Int128AddHi(hi, lo, child)),
    If(IsNull(child), lo, WrapAdd(lo, child)),
    org.apache.spark.sql.catalyst.expressions.And(empty, IsNull(child)))
  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Int128MergeHi(hi.left, lo.left, hi.right, lo.right),
    WrapAdd(lo.left, lo.right),
    org.apache.spark.sql.catalyst.expressions.And(empty.left, empty.right))
  override lazy val evaluateExpression: Expression =
    org.apache.spark.sql.catalyst.expressions.CreateNamedStruct(Seq(
      Literal("hi128"), hi, Literal("lo128"), lo, Literal("isEmpty"), empty))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Merges [[Decimal128SumPartial]] states (one per input row) into the same
  * double [[Decimal128Sum]] yields over the underlying rows. A null input
  * struct (can only arise from an outer-join null-extension above the
  * pre-aggregate) is treated as an empty state.
  */
case class Decimal128SumMerge(child: Expression, scale: Int)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes() =
    if (child.dataType == Decimal128SumPartial.resultType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_sum128_merge expects ${Decimal128SumPartial.resultType.catalogString}, got ${child.dataType.catalogString}")

  private lazy val hi = AttributeReference("hi128", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo128", LongType, nullable = false)()
  private lazy val empty = AttributeReference("isEmpty", BooleanType, nullable = false)()

  private def field(i: Int, name: String) =
    org.apache.spark.sql.catalyst.expressions.GetStructField(child, i, Some(name))
  private lazy val inHi = field(0, "hi128")
  private lazy val inLo = field(1, "lo128")
  // a null struct or a marked-empty state contributes nothing
  private lazy val inEmpty = org.apache.spark.sql.catalyst.expressions.Or(
    IsNull(child), field(2, "isEmpty"))

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(hi, lo, empty)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(true))
  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(inEmpty, hi, Int128MergeHi(hi, lo, inHi, inLo)),
    If(inEmpty, lo, WrapAdd(lo, inLo)),
    org.apache.spark.sql.catalyst.expressions.And(empty, inEmpty))
  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Int128MergeHi(hi.left, lo.left, hi.right, lo.right),
    WrapAdd(lo.left, lo.right),
    org.apache.spark.sql.catalyst.expressions.And(empty.left, empty.right))
  override lazy val evaluateExpression: Expression =
    If(empty, Literal(null, DoubleType), Int128ToDouble(hi, lo, scale))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
