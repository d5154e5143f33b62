package graft.api

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Dot-path resolution over structs and arrays — reference tests/field.test.ts. */
class FieldPathSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    ("d1", ("x", Seq(("t1", 1), ("t2", 2))), Seq("a", "b")),
    ("d2", ("y", Seq.empty[(String, Int)]), Seq.empty[String])
  ).toDF("slug", "meta", "plain")
    .withColumn("meta", col("meta").cast("struct<kind:string,tags:array<struct<name:string,rank:int>>>"))

  test("simple top-level scalar is detected for pushdown") {
    assert(FieldPath.isSimpleColumn(df, "slug"))
    assert(!FieldPath.isSimpleColumn(df, "meta"))
    assert(!FieldPath.isSimpleColumn(df, "plain"))
    assert(!FieldPath.isSimpleColumn(df, "meta.kind"))
  }

  test("struct descent resolves to a singleton string array") {
    val out = df.select(col("slug"), FieldPath.resolve(df, "meta.kind").as("v"))
      .orderBy("slug").collect()
    assert(out(0).getAs[scala.collection.Seq[String]]("v").toSeq == Seq("x"))
    assert(out(1).getAs[scala.collection.Seq[String]]("v").toSeq == Seq("y"))
  }

  test("array-of-struct descent flattens and stringifies all leaves") {
    val out = df.select(col("slug"), FieldPath.resolve(df, "meta.tags.name").as("v"))
      .orderBy("slug").collect()
    assert(out(0).getAs[scala.collection.Seq[String]]("v").toSeq == Seq("t1", "t2"))
    assert(out(1).getAs[scala.collection.Seq[String]]("v").toSeq == Seq.empty)
    val nums = df.select(FieldPath.resolve(df, "meta.tags.rank").as("v"))
      .orderBy("slug").collect()
    assert(nums(0).getAs[scala.collection.Seq[String]]("v").toSeq == Seq("1", "2")) // stringified like the reference
  }

  test("anyLeaf predicate matches any element") {
    val hit = df.filter(FieldPath.anyLeaf(df, "meta.tags.name", _ === "t2"))
      .select("slug").collect().map(_.getString(0)).toSeq
    assert(hit == Seq("d1"))
  }

  test("unknown segment raises a clear error") {
    val e = intercept[IllegalArgumentException](FieldPath.resolve(df, "meta.nope"))
    assert(e.getMessage.contains("nope"))
  }
}
