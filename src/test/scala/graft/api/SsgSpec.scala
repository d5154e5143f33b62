package graft.api

import java.nio.file.Files
import java.time.Instant

import graft.SparkSpec

/** The reference's SSG build-time contract (reference: src/ssg.ts:25-56):
  * query results materialize as static `{data, pageInfo, generatedAt}` JSON.
  */
class SsgSpec extends SparkSpec {
  import spark.implicits._

  private lazy val herbs = Seq(
    ("arctium-lappa", "Burdock", Seq("root", "edible")),
    ("centella-asiatica", "Gotu Kola", Seq("leaf")),
    ("cymbopogon-citratus", "Lemongrass", Seq("leaf", "edible"))
  ).toDF("slug", "name", "tagSlugs")

  private lazy val catalog = new Catalog(Seq(SourceDef("herbs", herbs)))

  private val t0 = Instant.parse("2026-01-02T03:04:05Z")

  test("staticQuery emits the reference StaticQueryResult JSON contract") {
    val json = Ssg.staticQuery(
      catalog.from("herbs").orderBy("name").pageSize(2).exec(), generatedAt = t0)
    // round-trip through the shared parser: the contract keys, page shape and
    // metadata all present and typed
    val root = graft.sources.MiniJson.parse(json).asInstanceOf[Map[String, Any]]
    assert(root.keySet == Set("data", "pageInfo", "generatedAt"))
    assert(root("generatedAt") == "2026-01-02T03:04:05Z")
    val data = root("data").asInstanceOf[Seq[Map[String, Any]]]
    assert(data.map(_("name")) == Seq("Burdock", "Gotu Kola"))
    assert(data.head("tagSlugs") == Seq("root", "edible"))
    val pi = root("pageInfo").asInstanceOf[Map[String, Any]]
    assert(pi("hasNextPage") == true && pi("hasPreviousPage") == false)
    assert(pi("endCursor").isInstanceOf[String])
    // the emitted cursor is the SAME wire format exec() accepts back
    val next = catalog.from("herbs").orderBy("name").pageSize(2)
      .cursor(pi("endCursor").asInstanceOf[String]).exec()
    assert(next.data.map(_.getAs[String]("name")) == Seq("Lemongrass"))
    // reference-shaped snapshot of the serialized record itself
    assert(json.contains(
      "{\"slug\":\"arctium-lappa\",\"name\":\"Burdock\",\"tagSlugs\":[\"root\",\"edible\"]}"))
  }

  test("writeAllPages walks the cursor chain and emits one JSON file per page") {
    val outDir = Files.createTempDirectory("graft-ssg").toString
    val paths = Ssg.writeAllPages(
      catalog.from("herbs").orderBy("name").pageSize(2), outDir, "herbs", generatedAt = t0)
    assert(paths.map(_.getFileName.toString) == Seq("herbs-000001.json", "herbs-000002.json"))
    val pages = paths.map(p =>
      graft.sources.MiniJson.parse(Files.readString(p)).asInstanceOf[Map[String, Any]])
    val names = pages.flatMap(_("data").asInstanceOf[Seq[Map[String, Any]]].map(_("name")))
    assert(names == Seq("Burdock", "Gotu Kola", "Lemongrass")) // full order, no dup/loss
    assert(pages.head("pageInfo").asInstanceOf[Map[String, Any]]("hasNextPage") == true)
    val last = pages.last("pageInfo").asInstanceOf[Map[String, Any]]
    assert(last("hasNextPage") == false && last("hasPreviousPage") == true)
    assert(pages.forall(_("generatedAt") == "2026-01-02T03:04:05Z"))
  }

  test("writeAllPages never mutates the caller's builder: rerun regenerates from page 1") {
    val qb = catalog.from("herbs").orderBy("name").pageSize(2)
    val dir1 = Files.createTempDirectory("graft-ssg-r1").toString
    val dir2 = Files.createTempDirectory("graft-ssg-r2").toString
    val run1 = Ssg.writeAllPages(qb, dir1, "herbs", generatedAt = t0)
    val run2 = Ssg.writeAllPages(qb, dir2, "herbs", generatedAt = t0) // same builder, again
    assert(run1.size == 2 && run2.size == 2) // NOT a one-page resume from a stale cursor
    val bytes1 = run1.map(Files.readString)
    val bytes2 = run2.map(Files.readString)
    assert(bytes1 == bytes2)
  }
}
