package graft.sources

import java.nio.file.{Files, Path}
import graft.SparkSpec

/** End-to-end: files on disk → parsed, slugged DataFrame (reference:
  * src/SourceLoader.ts + tests/query.test.ts fixtures, recreated as our own
  * test resources). */
class StaticSourcesSpec extends SparkSpec {

  private def write(dir: Path, rel: String, content: String): Unit = {
    val p = dir.resolve(rel)
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
  }

  private lazy val root: Path = {
    val d = Files.createTempDirectory("graft-src")
    write(d, "content/herbs/arctium-lappa.md",
      "---\nname: Burdock\ntagSlugs: [root, edible]\n---\nBody A\n")
    write(d, "content/herbs/centella-asiatica.md",
      "---\nname: Gotu Kola\ntagSlugs: [leaf]\n---\nBody B\n")
    write(d, "content/herbStates.yaml",
      "- slug: dry\n  name: Dried\n- slug: fresh\n  name: Fresh\n")
    write(d, "content/compounds.json",
      """[{"slug":"inulin","name":"Inulin"},{"slug":"arctigenin","name":"Arctigenin"}]""")
    write(d, "content/meta/site.json", """{"title":"Herbal DB","version":2}""")
    write(d, "content/shops.csv", "slug,name\ns1,Alpha\ns2,Beta\n")
    d
  }

  test("markdown front-matter files load with path-derived slugs") {
    val df = StaticSources.load(spark, s"$root/content/herbs/*.md", "markdown")
    val rows = df.orderBy("slug").collect()
    assert(rows.map(_.getAs[String]("slug")).toSeq == Seq("arctium-lappa", "centella-asiatica"))
    assert(rows.head.getAs[String]("name") == "Burdock")
    assert(rows.head.getAs[scala.collection.Seq[String]]("tagSlugs").toSeq == Seq("root", "edible"))
  }

  test("yaml array file yields one record per element keeping its own slug") {
    val df = StaticSources.load(spark, s"$root/content/herbStates.yaml", "yaml")
    assert(df.orderBy("slug").collect().map(_.getAs[String]("name")).toSeq == Seq("Dried", "Fresh"))
  }

  test("json array and object files load; object slug from path") {
    val arr = StaticSources.load(spark, s"$root/content/compounds.json", "json")
    assert(arr.count() == 2)
    val obj = StaticSources.load(spark, s"$root/content/meta/site.json", "json")
    val r = obj.head()
    assert(r.getAs[String]("slug") == "site")
    assert(r.getAs[String]("title") == "Herbal DB")
    assert(r.getAs[Long]("version") == 2L)
  }

  test("custom parser injection (CSV) — reference README 'Parser Injection'") {
    val csv: StaticSources.Parser = raw => {
      val lines = raw.trim.split("\\r?\\n").toList
      val headers = lines.head.split(",")
      lines.tail.map(l => headers.zip(l.split(",")).toMap: Map[String, Any])
    }
    val df = StaticSources.load(spark, s"$root/content/shops.csv", "csv",
      StaticSources.defaultParsers + ("csv" -> csv))
    assert(df.orderBy("slug").collect().map(_.getAs[String]("name")).toSeq == Seq("Alpha", "Beta"))
  }

  test("includeRaw attaches the whole file content like the reference's loadBySlug") {
    val df = StaticSources.load(spark, s"$root/content/herbs/*.md", "markdown", includeRaw = true)
    val r = df.filter(org.apache.spark.sql.functions.col("slug") === "arctium-lappa").head()
    assert(r.getAs[String]("raw").startsWith("---\nname: Burdock"))
    assert(r.getAs[String]("raw").contains("Body A"))
  }

  test("slugFromPath mirrors the reference's -- encoding for nested paths") {
    assert(StaticSources.slugFromPath("content/herbs/*.md", "/x/content/herbs/a.md") == "a")
    assert(StaticSources.slugFromPath("content/recipes/**/*.md",
      "/x/content/recipes/group01/001.md") == "group01--001")
  }

  test("validation integrates at ingest: bad record raises") {
    val schema = Map[String, Any](
      "type" -> "object",
      "required" -> Seq("name"),
      "properties" -> Map("name" -> Map("type" -> "string")))
    val good = MiniYaml.parse("name: ok")
    Validation.validateRecord(good, schema) // no throw
    val bad = MiniYaml.parse("other: 1")
    val e = intercept[IllegalArgumentException](Validation.validateRecord(bad, schema))
    assert(e.getMessage.contains("Missing required field"))
  }
}
