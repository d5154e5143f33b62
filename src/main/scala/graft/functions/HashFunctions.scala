package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MinHash and SimHash signatures as pure column algebra (no UDFs).
  *
  * The per-shingle base hash is `xxhash64`; the k MinHash "permutations" are
  * the standard (a*h + b) universal-hash family over the 64-bit ring with
  * fixed seeded constants, so signatures are deterministic across runs and
  * cluster sizes. All loops are `transform`/`aggregate` higher-order
  * functions — evaluated per-row inside codegen, shuffling nothing.
  */
object HashFunctions {

  /** Mersenne prime modulus for the universal hash family — all arithmetic
    * stays below 2^62, so it is safe under Spark's default ANSI overflow
    * checking (no Long wraparound anywhere).
    */
  val P: Long = 2147483647L // 2^31 - 1

  /** Deterministic multiplier/offset constants for the k hash family (shared
    * with the native expression twin, graft.plans.MinHashState).
    */
  def familyConstants(k: Int, seed: Long): (Array[Long], Array[Long]) = family(k, seed)

  private def family(k: Int, seed: Long): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(seed)
    val a   = Array.fill(k)(1L + rnd.nextInt(Int.MaxValue - 1).toLong)
    val b   = Array.fill(k)(rnd.nextInt(Int.MaxValue).toLong)
    (a, b)
  }

  /** Word w-shingles of the token array: `["a b c", "b c d", ...]`. */
  def shingles(tokens: Column, w: Int = 3): Column =
    when(size(tokens) < w, array(concat_ws(" ", tokens)))
      .otherwise(
        transform(sequence(lit(0), size(tokens) - w),
          i => concat_ws(" ", slice(tokens, i + 1, lit(w)))))

  /** 64-bit hashes of the shingles (the MinHash base set). */
  def shingleHashes(tokens: Column, w: Int = 3): Column =
    array_distinct(transform(shingles(tokens, w), s => xxhash64(s)))

  /** k-element MinHash signature (array<long>) of a shingle-hash array.
    * Each "permutation" is (a_i * (h mod P) + b_i) mod P with a_i, b_i < 2^31:
    * products stay < 2^62 (ANSI-safe), and the family is the classic universal
    * one over the Mersenne prime field.
    *
    * ONE aggregate pass with an array<long> accumulator (zip_with per element).
    * Higher-order functions evaluate interpreted (outside codegen), and
    * projection collapse can inline an expression tree many times — k separate
    * aggregates made the tree O(k·|shingles|) PER REFERENCE and benchmarked
    * ~400× slower. Single-pass keeps it linear however often it's inlined.
    */
  def minhashSignature(hashes: Column, k: Int = 32, seed: Long = 42L): Column = {
    val (a, b) = family(k, seed)
    val aLit = typedLit(a.toSeq)
    val bLit = typedLit(b.toSeq)
    aggregate(
      hashes,
      array_repeat(lit(Long.MaxValue), k),
      (acc, h) => {
        val hm = pmod(h, lit(P))
        zip_with(acc, sequence(lit(0), lit(k - 1)), (cur, i) =>
          least(cur, pmod(hm * element_at(aLit, i + 1) + element_at(bLit, i + 1), lit(P))))
      })
  }

  /** LSH band hashes: the signature split into `bands` row-groups, each hashed
    * to one long. Two documents sharing any band hash are near-dup candidates.
    * Row-group width derives from the ACTUAL signature length (a fixed width
    * would silently ignore the signature tail for non-default k and break
    * parity with the native MinHashState). CONTRACT: signature length must be
    * a multiple of `bands` (the native MinHashState enforces it; with a
    * runtime-length Column this function cannot) — otherwise the k mod bands
    * tail never influences any band.
    */
  def bandHashes(signature: Column, bands: Int = 8): Column = {
    val width = (size(signature) / bands).cast("int")
    transform(sequence(lit(0), lit(bands - 1)),
      j => xxhash64(slice(signature, j * width + 1, width), j))
  }

  private val pow2: Seq[Long] = (0 until 64).map(i => 1L << i)

  /** 64-bit SimHash over token hashes: per-bit vote (+1 if set, -1 if not)
    * summed across tokens; bit i of the result is set when the vote is >= 0.
    */
  def simhash(tokens: Column): Column = {
    val hashes = transform(tokens, t => xxhash64(t))
    val votes = aggregate(
      hashes,
      array_repeat(lit(0L), 64),
      (acc, h) =>
        zip_with(acc, typedLit(pow2), (a, p) =>
          a + when((h.bitwiseAND(p)) =!= 0L, 1L).otherwise(-1L)))
    aggregate(
      zip_with(votes, typedLit(pow2), (v, p) => when(v >= 0L, p).otherwise(0L)),
      lit(0L),
      (acc, bit) => acc + bit)
  }

  /** Hamming distance between two 64-bit SimHashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash LSH chunks: the 64-bit hash split into `chunks` equal bit ranges;
    * near-dups within `bits/chunks`-ish Hamming distance share a chunk value.
    */
  def simhashChunks(sim: Column, chunks: Int = 4): Column = {
    val width = 64 / chunks
    val mask  = (1L << width) - 1
    array((0 until chunks).map(j =>
      shiftrightunsigned(sim, j * width).bitwiseAND(lit(mask))): _*)
  }
}
