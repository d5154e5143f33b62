package graft.sources

import java.nio.file.{Files, Path}

import graft.SparkSpec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class MarkdownSourceV2Spec extends SparkSpec {

  private def write(dir: Path, rel: String, content: String): Unit = {
    val p = dir.resolve(rel)
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
  }

  private lazy val root: Path = {
    val d = Files.createTempDirectory("graft-dsv2")
    write(d, "content/posts/alpha.md",
      "---\ntitle: Alpha\nviews: 3\nscore: 1.5\npublished: true\ntags: [a, b]\n---\nBody of alpha\n")
    write(d, "content/posts/beta.md",
      "---\ntitle: Beta\nviews: 7\npublished: false\n---\nBody of beta\n")
    write(d, "content/posts/nested/gamma.md",
      "---\ntitle: Gamma\nscore: 2\n---\nBody of gamma\n")
    d
  }

  private def read() =
    spark.read.format("graft-markdown").load(s"$root/content/posts/*.md")

  test("short name resolves; rows carry slug, attributes and body") {
    val rows = read().orderBy("slug").collect()
    assert(rows.map(_.getAs[String]("slug")).toSeq == Seq("alpha", "beta"))
    val alpha = rows.head
    assert(alpha.getAs[String]("title") == "Alpha")
    assert(alpha.getAs[Long]("views") == 3L)
    assert(alpha.getAs[Double]("score") == 1.5)
    assert(alpha.getAs[Boolean]("published"))
    assert(alpha.getAs[scala.collection.Seq[String]]("tags").toSeq == Seq("a", "b"))
    assert(alpha.getAs[String]("body").trim == "Body of alpha")
    // missing attributes are null (schema-on-read)
    val beta = rows(1)
    assert(beta.isNullAt(beta.fieldIndex("score")))
    assert(beta.isNullAt(beta.fieldIndex("tags")))
  }

  test("inferred schema: bounded sample, widened types, slug first body last") {
    val s = read().schema
    assert(s.fields.head.name == "slug" && s.fields.last.name == "body")
    assert(s("views").dataType == LongType)
    assert(s("score").dataType == DoubleType) // 1.5 (double) + 2 (long) widen
    assert(s("published").dataType == BooleanType)
    assert(s("tags").dataType == ArrayType(StringType))
  }

  test("glob crossing directories derives -- slugs like StaticSources") {
    // base dir is everything before the first '*' → content/; the slug is
    // the relative path with '/' → '--' (Hadoop globs are per-segment:
    // */*.md is one directory level)
    val df = spark.read.format("graft-markdown").load(s"$root/content/*/*.md")
    val slugs = df.select("slug").collect().map(_.getString(0)).toSet
    assert(slugs == Set("posts--alpha", "posts--beta"), s"unexpected slugs $slugs")
  }

  test("column pruning reaches the scan: slug-only projection drops body") {
    val df = read().select("slug", "title")
    val scan = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }
    assert(scan.nonEmpty, df.queryExecution.executedPlan.toString)
    val out = scan.head.output.map(_.name).toSet
    assert(out == Set("slug", "title"), s"scan did not prune: $out")
  }

  test("values match the StaticSources path (parity)") {
    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val v2 = key(read().select("slug", "title", "views").orderBy("slug").collect())
    val v1 = key(StaticSources.load(spark, s"$root/content/posts/*.md", "markdown")
      .select("slug", "title", "views").orderBy("slug").collect())
    assert(v2 == v1 && v2 == Seq(("alpha", "Alpha", 3L), ("beta", "Beta", 7L)))
  }

  test("user schema skips inference and is respected") {
    val s = StructType(Seq(
      StructField("slug", StringType), StructField("views", LongType)))
    val rows = spark.read.format("graft-markdown").schema(s)
      .load(s"$root/content/posts/*.md").orderBy("slug").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("alpha", 3L), ("beta", 7L)))
  }

  test("partition planning bin-packs: tiny target splits, default coalesces") {
    val coalesced = read().rdd.getNumPartitions
    assert(coalesced == 1, s"two tiny files should pack into one partition, got $coalesced")
    val split = spark.read.format("graft-markdown")
      .option("maxPartitionBytes", "1")
      .load(s"$root/content/posts/*.md").rdd.getNumPartitions
    assert(split == 2, s"1-byte target must isolate each file, got $split")
  }

  test("count(*) works with the empty projection") {
    assert(read().count() == 2L)
  }

  test("slug derivation anchors at the qualified base, not a lookalike parent") {
    // a parent directory that merely repeats the glob base must not shift
    // the slug anchor (the StaticSources qualification discipline)
    val d = Files.createTempDirectory("graft-dsv2q")
    write(d, "content/posts/content/posts/deep.md", "---\ntitle: Deep\n---\nBody\n")
    val slugs = spark.read.format("graft-markdown")
      .load(s"$d/content/posts/*/*/*.md")
      .select("slug").collect().map(_.getString(0)).toSet
    assert(slugs == Set("content--posts--deep"), s"got $slugs")
  }

  test("path-only projections (slug, count) never read file bytes") {
    // reader-level pin with a NONEXISTENT file: a slug-only (or empty)
    // projection must emit its row purely from the path, while any
    // content-needing projection must fail trying to open the file.
    // (A permission-bits fixture can't test this — specs run as root.)
    val files = Array(MarkdownFile("/nonexistent-graft/x.md", 10))
    def reader(fields: StructField*) = new MarkdownPartitionReader(
      files, StructType(fields), "/nonexistent-graft/*.md", Array.empty)
    val slugOnly = reader(StructField("slug", StringType))
    assert(slugOnly.next())
    assert(slugOnly.get().getUTF8String(0).toString == "x")
    assert(!slugOnly.next())
    val empty = reader() // count(*) projection
    assert(empty.next() && empty.get().numFields == 0 && !empty.next())
    val needsContent = reader(StructField("slug", StringType),
      StructField("title", StringType))
    intercept[Exception](needsContent.next())
  }
}
