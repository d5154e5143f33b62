package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSpec, Tables}

/** FusedTopK: the fused mapPartitions retrieval pass must be ROW-IDENTICAL
  * (scores bit-for-bit, tie order included) to the join + bounded-aggregate
  * formulation it replaces, across the edge corpus (null vectors, null
  * elements, zero vectors, mismatched lengths, exact-duplicate vectors → id
  * tie-breaks, k larger than the corpus) and the real testdata shapes.
  */
class FusedTopKSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  import scala.jdk.CollectionConverters._

  /** Edge corpus: floats like the real embeddings table. */
  private lazy val planted: DataFrame = {
    def v(xs: Float*): Seq[Float] = xs
    val rows = Seq(
      Row(1L, v(1f, 0f, 0f), 0),
      Row(2L, v(1f, 0f, 0f), 1),            // exact dup of 1 → tie on score
      Row(3L, v(0f, 1f, 0f), 0),
      Row(4L, v(0.6f, 0.8f, 0f), 1),
      Row(5L, v(0f, 0f, 0f), 0),            // zero vector → score 0.0
      Row(6L, null, 1),                      // null vector → null score
      Row(7L, Seq[Any](0.5f, null, 0.5f), 0), // null element → null score
      Row(8L, v(1f, 0f), 1),                 // mismatched length → null score
      Row(9L, v(-1f, 0f, 0f), null)          // null label
    )
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = true)),
      StructField("label", IntegerType, nullable = true)))
    spark.createDataFrame(rows.asJava, schema)
  }

  private def sortedRows(df: DataFrame): Seq[Row] =
    df.collect().toSeq.sortBy(_.toString)

  test("bruteForceTopK: fused == join path on the edge corpus (both excludeSelf modes)") {
    val queries = planted.select(col("vec_id").as("query_id"), col("embedding"))
    for (ex <- Seq(true, false)) {
      val fused = Similarity.bruteForceTopK(planted, queries, k = 4,
        excludeSelf = ex, fused = true)
      val join = Similarity.bruteForceTopK(planted, queries, k = 4,
        excludeSelf = ex, fused = false)
      assert(sortedRows(fused) == sortedRows(join), s"excludeSelf=$ex")
    }
  }

  test("bruteForceTopK: k exceeding the corpus still matches") {
    val queries = planted.limit(2).select(col("vec_id").as("query_id"), col("embedding"))
    val fused = Similarity.bruteForceTopK(planted, queries, k = 50, fused = true)
    val join  = Similarity.bruteForceTopK(planted, queries, k = 50, fused = false)
    assert(sortedRows(fused) == sortedRows(join))
  }

  test("hardNegatives: fused == join path incl. null labels") {
    val anchors = planted.select(col("vec_id").as("anchor_id"),
      col("embedding"), col("label"))
    val fused = Similarity.hardNegatives(planted, anchors, k = 3, fused = true)
    val join  = Similarity.hardNegatives(planted, anchors, k = 3, fused = false)
    assert(sortedRows(fused) == sortedRows(join))
  }

  test("adcTopKBatch: fused == join path on real embeddings") {
    val cb = Pq.formulaCodebook(m = 8, ksub = 16, dsub = 8)
    val emb = Tables.load(spark, dir, "embeddings").filter(col("embedding").isNotNull)
    val encoded = Pq.encode(emb, cb)
    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    for (ex <- Seq(true, false)) {
      val fused = Pq.adcTopKBatch(encoded, cb, queries, k = 5,
        excludeSelf = ex, fused = true)
      val join = Pq.adcTopKBatch(encoded, cb, queries, k = 5,
        excludeSelf = ex, fused = false)
      assert(sortedRows(fused) == sortedRows(join), s"excludeSelf=$ex")
    }
  }

  test("IvfIndex.topKBatch: fused == join path at nprobe<nlist and nprobe=nlist") {
    val emb = Tables.load(spark, dir, "embeddings")
    val index = Similarity.ivfIndex(emb, nlist = 8, seed = 7L)
    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    for (nprobe <- Seq(2, 8); ex <- Seq(true, false)) {
      val fused = index.topKBatch(queries, k = 5, nprobe = nprobe,
        excludeSelf = ex, fused = true)
      val join = index.topKBatch(queries, k = 5, nprobe = nprobe,
        excludeSelf = ex, fused = false)
      assert(sortedRows(fused) == sortedRows(join), s"nprobe=$nprobe excludeSelf=$ex")
    }
  }

  test("semDupesOnIndex: fused pair scan == join path (planted edges + real embeddings)") {
    // planted: exact dups (cosine 1.0), a zero vector, scaled copies
    // (cosine 1.0 at different norms). Null vectors/elements are excluded
    // by ivfIndex's own contract (NearestCenter throws on them — the
    // assignment scan must never silently misfile a vector), so the
    // null-score path has no reachable input here; the topK tests above
    // cover those edges where they ARE reachable.
    val rows = Seq(
      Row(1L, Seq(1f, 0f, 0f)), Row(2L, Seq(1f, 0f, 0f)),   // dup pair
      Row(3L, Seq(2f, 0f, 0f)),                              // scaled copy of 1,2
      Row(4L, Seq(0f, 1f, 0f)),
      Row(5L, Seq(0f, 0f, 0f)))                              // zero vector
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = true))))
    val df = spark.createDataFrame(rows.asJava, schema)
    val idxPlanted = Similarity.ivfIndex(df, nlist = 2, seed = 7L)
    for (thr <- Seq(0.999, 0.5)) {
      val fused = Similarity.semDupesOnIndex(idxPlanted, dim = 3, threshold = thr,
        nbits = 4, fused = true).select("id_a", "id_b", "score")
      val join = Similarity.semDupesOnIndex(idxPlanted, dim = 3, threshold = thr,
        nbits = 4, fused = false).select("id_a", "id_b", "score")
      assert(sortedRows(fused) == sortedRows(join), s"threshold=$thr")
    }
    // real embeddings with the q_dedup_semantic shape (planted exact dups)
    val emb = Tables.load(spark, dir, "embeddings")
    val aug = emb.unionByName(emb.filter(col("vec_id") % 50 === 0)
      .withColumn("vec_id", col("vec_id") + 1000000000L))
    val index = Similarity.ivfIndex(aug, nlist = 8, seed = 7L)
    val fusedR = Similarity.semDupesOnIndex(index, dim = 64, threshold = 0.999, fused = true)
    val joinR  = Similarity.semDupesOnIndex(index, dim = 64, threshold = 0.999, fused = false)
    assert(sortedRows(fusedR.select("id_a", "id_b", "score")) ==
           sortedRows(joinR.select("id_a", "id_b", "score")))
    assert(fusedR.count() > 0) // the planted dups are actually found
  }

  test("real embeddings: fused bruteForceTopK scores bit-equal to the join path") {
    val emb = Tables.load(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val fused = Similarity.bruteForceTopK(emb, queries, k = 5,
      excludeSelf = true, fused = true).orderBy("query_id", "vec_id").collect().toSeq
    val join = Similarity.bruteForceTopK(emb, queries, k = 5,
      excludeSelf = true, fused = false).orderBy("query_id", "vec_id").collect().toSeq
    assert(fused == join) // Row equality: double scores must match BITWISE
  }

  test("hardNegatives on real embeddings: fused == join path") {
    val emb = Tables.load(spark, dir, "embeddings")
    val anchors = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("anchor_id"), col("embedding"), col("label"))
    val fused = Similarity.hardNegatives(emb, anchors, k = 5, fused = true)
    val join  = Similarity.hardNegatives(emb, anchors, k = 5, fused = false)
    assert(sortedRows(fused) == sortedRows(join))
  }
}
