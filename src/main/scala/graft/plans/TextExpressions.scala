package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the dedup hot path.
  *
  * The pure-`functions._` formulations (graft.functions.HashFunctions) are
  * correct but evaluate through interpreted higher-order functions — fine for
  * composition, ruinous in a 100 TB scan (each shingle pays boxing + lambda
  * dispatch, and any expression inlining multiplies the whole tree). These
  * expressions do the complete shingle→hash→signature→bands pipeline in one
  * tight JVM loop per row: one pass over the text, primitive arrays, zero
  * boxing. `CodegenFallback` keeps them embeddable in WholeStageCodegen spans.
  *
  * Hash parity: per-shingle hashes are `xxhash64(shingle)` (same
  * XxHash64Function, seed 42) and the permutation family shares
  * [[graft.functions.HashFunctions.family]]'s constants, so native and
  * column-algebra outputs are interchangeable.
  */
object TextExpressions {

  /** struct<shingle_hashes, signature, band_hashes> for MinHash-LSH dedup. */
  def minhashState(text: Column, k: Int = 32, w: Int = 3, bands: Int = 8,
                   seed: Long = 42L): Column =
    ColumnShim.column(
      MinHashState(ColumnShim.expression(text), k, w, bands, seed))

  /** 64-bit SimHash over whitespace tokens (native twin of
    * HashFunctions.simhash). */
  def simhash64(text: Column): Column =
    ColumnShim.column(SimHash64(ColumnShim.expression(text)))

  /** Distinct word w-shingles as strings (native twin of
    * HashFunctions.shingles + array_distinct). */
  def shingleSet(text: Column, w: Int = 3): Column =
    ColumnShim.column(ShingleSet(ColumnShim.expression(text), w))
}

case class MinHashState(child: Expression, k: Int, w: Int, bands: Int, seed: Long)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {

  // analysis-time type error for non-string inputs (these are SQL-registered)
  override def inputTypes = ColumnShim.stringInput

  require(bands > 0 && k % bands == 0,
    s"signature length k=$k must be a positive multiple of bands=$bands")

  private val P = graft.functions.HashFunctions.P
  private val (aConst, bConst) = graft.functions.HashFunctions.familyConstants(k, seed)
  private val rowsPerBand = k / bands

  override def dataType: DataType = StructType(Seq(
    StructField("shingle_hashes", ArrayType(LongType, containsNull = false)),
    StructField("signature", ArrayType(LongType, containsNull = false)),
    StructField("band_hashes", ArrayType(LongType, containsNull = false))))

  override def nullSafeEval(input: Any): Any = {
    val text   = input.asInstanceOf[UTF8String].toString
    val tokens = text.trim.split("\\s+")
    val nSh    = math.max(1, tokens.length - w + 1)
    // distinct shingle hashes
    val seen   = new java.util.HashSet[Long](nSh * 2)
    val hashes = new scala.collection.mutable.ArrayBuffer[Long](nSh)
    val sb     = new java.lang.StringBuilder
    var i = 0
    while (i < nSh) {
      sb.setLength(0)
      val end = math.min(i + w, tokens.length)
      var j = i
      while (j < end) { if (j > i) sb.append(' '); sb.append(tokens(j)); j += 1 }
      val h = XxHash64Function.hash(UTF8String.fromString(sb.toString), StringType, 42L)
      if (seen.add(h)) hashes += h
      i += 1
    }
    // signature: k mins over the universal family
    val sig = Array.fill(k)(Long.MaxValue)
    var s = 0
    while (s < hashes.length) {
      val hm = java.lang.Math.floorMod(hashes(s), P)
      var p = 0
      while (p < k) {
        val v = java.lang.Math.floorMod(hm * aConst(p) + bConst(p), P)
        if (v < sig(p)) sig(p) = v
        p += 1
      }
      s += 1
    }
    // band hashes: EXACTLY HashFunctions.bandHashes' scheme —
    // xxhash64(slice, j) = seed 42, chain the slice's elements (Spark hashes
    // array values element-by-element), then the band index as an int. Keeping
    // the two paths bit-identical means signatures indexed with one path can
    // be probed with the other.
    val bandArr = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 42L
      var r = b * rowsPerBand
      val end = r + rowsPerBand
      while (r < end) { h = XxHash64Function.hash(sig(r), LongType, h); r += 1 }
      bandArr(b) = XxHash64Function.hash(b, IntegerType, h)
      b += 1
    }
    InternalRow(
      new GenericArrayData(hashes.toArray),
      new GenericArrayData(sig),
      new GenericArrayData(bandArr))
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashState =
    copy(child = newChild)
}

case class ShingleSet(child: Expression, w: Int)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {

  override def inputTypes = ColumnShim.stringInput

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val tokens = input.asInstanceOf[UTF8String].toString.trim.split("\\s+")
    val nSh    = math.max(1, tokens.length - w + 1)
    val seen   = new java.util.LinkedHashSet[String](nSh * 2)
    val sb     = new java.lang.StringBuilder
    var i = 0
    while (i < nSh) {
      sb.setLength(0)
      val end = math.min(i + w, tokens.length)
      var j = i
      while (j < end) { if (j > i) sb.append(' '); sb.append(tokens(j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it  = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {

  override def inputTypes = ColumnShim.stringInput

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val tokens = input.asInstanceOf[UTF8String].toString.trim.split("\\s+")
    val votes  = new Array[Int](64)
    var t = 0
    while (t < tokens.length) {
      val h = XxHash64Function.hash(UTF8String.fromString(tokens(t)), StringType, 42L)
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
      t += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) { if (votes(bit) >= 0) out |= (1L << bit); bit += 1 }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
