package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.api._
import graft.functions.{HashFunctions => H, TextFunctions => T}
import graft.operators.{Dedup, Multimodal, Similarity}

/** Regressions for the round-2 code-review findings. */
class ReviewRegressionSpec extends SparkSpec {
  import spark.implicits._

  test("exec with joins preserves the page's display order") {
    val herbs = Seq(
      ("a-herb", "Zeta", Seq("t1")), ("b-herb", "Alpha", Seq("t1")),
      ("c-herb", "Mid", Seq("t1")), ("d-herb", "Beta", Seq("t2"))
    ).toDF("slug", "name", "tagIds")
    val tagsDf = Seq(("t1", "one"), ("t2", "two")).toDF("tid", "tname")
    val cat = new Catalog(Seq(
      SourceDef("herbs", herbs, relations = Map(
        "tags" -> BelongsToMany("tags", "tags", "tagIds", "tid"))),
      SourceDef("tags", tagsDf, slugField = "tid")))
    val r = cat.from("herbs").orderBy("name", "desc").join("tags").pageSize(3).exec()
    assert(r.data.map(_.getAs[String]("name")) == Seq("Zeta", "Mid", "Beta"))
    assert(r.data.head.getAs[scala.collection.Seq[Row]]("tags").nonEmpty)
  }

  test("bruteForceTopK returns k rows PER query") {
    val vecs = (0L until 30L).map(i => (i, Seq.fill(4)((i % 7).toFloat + 1f))).toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" < 2).select($"vec_id".as("query_id"), $"embedding")
    val out = Similarity.bruteForceTopK(vecs, queries, k = 5)
    val counts = out.groupBy("query_id").count().collect().map(_.getLong(1)).toSeq
    assert(counts == Seq(5, 5))
  }

  test("desc pagination reaches rows with null order values after a cursor") {
    val df = Seq(("a", Some(3)), ("b", Some(1)), ("c", None), ("d", Some(2)), ("e", None))
      .toDF("slug", "rank")
    // display desc: a(3), d(2), b(1), then nulls last: c, e
    val p1 = Pagination.exec(df, "rank", "slug", descending = true, 3, None, After)
    assert(p1.data.map(_.getString(0)) == Seq("a", "d", "b"))
    val p2 = Pagination.exec(df, "rank", "slug", descending = true, 3,
      p1.pageInfo.endCursor.map(Cursor.decode), After)
    assert(p2.data.map(_.getString(0)) == Seq("e", "c"), "null-ranked rows must be reachable")
    // null boundary rows anchor no cursor (can't keyset past a null)
    assert(p2.pageInfo.endCursor.isEmpty && p2.pageInfo.startCursor.isEmpty)
    assert(!p2.pageInfo.hasNextPage)
  }

  test("nested-path order keys emit cursors with the user-facing key name") {
    val df = Seq(("s1", ("x", 2)), ("s2", ("y", 1))).toDF("slug", "meta")
      .withColumn("meta", col("meta").cast("struct<kind:string,rank:int>"))
    val cat = new Catalog(Seq(SourceDef("t", df)))
    val p = cat.from("t").orderBy("meta.kind").pageSize(1).exec()
    val c = Cursor.decode(p.pageInfo.endCursor.get)
    assert(c.orderKey == "meta.kind", s"leaked internal name: ${c.orderKey}")
  }

  test("orderBy on an indexed dot-path passes the index guard") {
    val df = Seq(("s1", ("x", 2))).toDF("slug", "meta")
      .withColumn("meta", col("meta").cast("struct<kind:string,rank:int>"))
    val cat = new Catalog(Seq(
      SourceDef("t", df, indexedFields = Some(Set("meta.kind")))))
    assert(cat.from("t").orderBy("meta.kind").exec().data.nonEmpty)
  }

  test("HOF and native MinHash band hashes are bit-identical") {
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog tonight")).toDF("doc_id", "text")
    val native = Dedup.minhashed(docs).select("band_hashes").head()
      .getAs[scala.collection.Seq[Long]](0).toSeq
    val hof = docs.select(
      H.bandHashes(H.minhashSignature(H.shingleHashes(T.tokens($"text"))), 8, 4).as("bh"))
      .head().getAs[scala.collection.Seq[Long]](0).toSeq
    assert(native == hof, "index built with one path must be probe-able with the other")
  }

  test("array-key nested relation preserves duplicate base rows") {
    val base = Seq(("p1", Seq("t1")), ("p1", Seq("t1")), ("p2", Seq.empty[String]))
      .toDF("slug", "tagIds")
    val tagsDf = Seq(("t1", "one")).toDF("tid", "tname")
    val out = Relations.nested(base, BelongsToMany("tags", "tags", "tagIds", "tid"), tagsDf)
    assert(out.count() == 3, "duplicate base rows must survive the regroup")
  }

  test("repartitionByBytes on an empty frame is a no-op, not an NPE") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], Multimodal.assetSchema)
    assert(Multimodal.repartitionByBytes(empty).count() == 0)
  }
}
