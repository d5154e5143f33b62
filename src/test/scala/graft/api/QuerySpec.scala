package graft.api

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Mirrors the reference's QueryBuilder behaviors (reference: tests/query.test.ts)
  * on an in-memory herbs/recipes fixture shaped like tests/content/.
  */
class QuerySpec extends SparkSpec {
  import spark.implicits._

  private lazy val herbs = Seq(
    ("arctium-lappa", "Burdock", Seq("root", "edible")),
    ("centella-asiatica", "Gotu Kola", Seq("leaf")),
    ("cymbopogon-citratus", "Lemongrass", Seq("leaf", "edible"))
  ).toDF("slug", "name", "tagSlugs")

  private lazy val recipes = Seq(
    ("recipe-1", "Calming Tea", Seq("centella-asiatica", "cymbopogon-citratus")),
    ("recipe-2", "Root Broth", Seq("arctium-lappa"))
  ).toDF("slug", "name", "herbSlugs")

  private lazy val catalog = new Catalog(Seq(
    SourceDef("herbs", herbs,
      // inverse relation: the herb's slug appears in recipes.herbSlugs (an
      // array foreign key — keyedForeign explodes it)
      relations = Map("recipes" ->
        BelongsToMany("recipes", "recipes", "slug", "herbSlugs"))),
    SourceDef("recipes", recipes,
      relations = Map("herbs" ->
        BelongsToMany("herbs", "herbs", "herbSlugs", "slug")))
  ))

  test("eq on slug finds exactly one record") {
    val r = catalog.from("herbs").where("slug", Eq, "arctium-lappa").exec()
    assert(r.data.map(_.getAs[String]("name")) == Seq("Burdock"))
  }

  test("default query returns all records ordered by slug with pageInfo") {
    val r = catalog.from("herbs").exec()
    assert(r.data.map(_.getAs[String]("slug")) ==
      Seq("arctium-lappa", "centella-asiatica", "cymbopogon-citratus"))
    assert(!r.pageInfo.hasNextPage && !r.pageInfo.hasPreviousPage)
    assert(r.pageInfo.startCursor.isDefined && r.pageInfo.endCursor.isDefined)
  }

  test("startsWith filter") {
    val r = catalog.from("herbs").where("slug", StartsWith, "c").exec()
    assert(r.data.map(_.getAs[String]("slug")) ==
      Seq("centella-asiatica", "cymbopogon-citratus"))
  }

  test("in filter on nested array field") {
    val r = catalog.from("herbs").where("tagSlugs", In, Seq("root")).exec()
    assert(r.data.map(_.getAs[String]("name")) == Seq("Burdock"))
  }

  test("orderBy name desc") {
    val r = catalog.from("herbs").orderBy("name", "desc").exec()
    assert(r.data.map(_.getAs[String]("name")) ==
      Seq("Lemongrass", "Gotu Kola", "Burdock"))
  }

  test("relation filter selects parents; join still attaches ALL related") {
    // reference: recipes.join("herbs").where("herbs.slug","in",[...]) returns
    // recipe-1 with BOTH its herbs attached (tests/query.test.ts:30-38)
    val r = catalog.from("recipes")
      .join("herbs")
      .where("herbs.slug", In, Seq("centella-asiatica"))
      .exec()
    assert(r.data.map(_.getAs[String]("slug")) == Seq("recipe-1"))
    val attached = r.data.head.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("herbs")
    assert(attached.map(_.getAs[String]("slug")).sorted ==
      Seq("centella-asiatica", "cymbopogon-citratus"))
  }

  test("pagination: next page via endCursor, back via startCursor") {
    val first = catalog.from("herbs").orderBy("name", "asc").pageSize(2).exec()
    assert(first.data.map(_.getAs[String]("slug")) ==
      Seq("arctium-lappa", "centella-asiatica"))
    assert(first.pageInfo.hasNextPage && !first.pageInfo.hasPreviousPage)

    val second = catalog.from("herbs").orderBy("name", "asc").pageSize(2)
      .cursor(first.pageInfo.endCursor.get).exec()
    assert(second.data.map(_.getAs[String]("slug")) == Seq("cymbopogon-citratus"))
    assert(!second.pageInfo.hasNextPage && second.pageInfo.hasPreviousPage)
  }

  test("inverse belongsToMany through the foreign array key") {
    val r = catalog.from("herbs").join("recipes")
      .where("slug", Eq, "cymbopogon-citratus").exec()
    val attached = r.data.head.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("recipes")
    assert(attached.map(_.getAs[String]("slug")) == Seq("recipe-1"))
  }

  test("find returns the record; unknown relation rejected") {
    val row = catalog.from("herbs").find("centella-asiatica").collect()
    assert(row.length == 1 && row.head.getAs[String]("name") == "Gotu Kola")
    intercept[IllegalArgumentException](catalog.from("herbs").join("nope"))
  }

  test("peek projects only slug + order key") {
    val p = catalog.from("herbs").orderBy("name").pageSize(2).peek()
    assert(p.columns.toSeq == Seq("slug", "name"))
    assert(p.collect().map(_.getString(0)).toSeq ==
      Seq("arctium-lappa", "centella-asiatica"))
  }

  test("non-indexed field filter throws 'needs index' like the reference") {
    val guarded = new Catalog(Seq(
      SourceDef("herbs", herbs, indexedFields = Some(Set("name")))))
    val e = intercept[IllegalArgumentException](
      guarded.from("herbs").where("tagSlugs", Eq, "root").exec())
    assert(e.getMessage.contains("needs index"))
  }
}
