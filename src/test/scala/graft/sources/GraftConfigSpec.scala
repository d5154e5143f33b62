package graft.sources

import java.nio.file.{Files, Path}
import org.apache.spark.sql.Row
import graft.SparkSpec
import graft.api._

/** End-to-end config-driven workflow — the reference's tests/query.test.ts
  * scenarios run through `GraftConfig` (config JSON → catalog → indexes →
  * queries), on fixtures shaped like tests/content/.
  */
class GraftConfigSpec extends SparkSpec {

  private def write(dir: Path, rel: String, content: String): Unit = {
    val p = dir.resolve(rel)
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
  }

  private lazy val root: Path = {
    val d = Files.createTempDirectory("graft-cfg")
    write(d, "content/herbs/arctium-lappa.md",
      "---\nname: Burdock\ntagSlugs: [root, edible]\noverview: a root vegetable\n---\nBody A\n")
    write(d, "content/herbs/centella-asiatica.md",
      "---\nname: Gotu Kola\ntagSlugs: [leaf]\noverview: a creeping herb\n---\nBody B\n")
    write(d, "content/herbs/cymbopogon-citratus.md",
      "---\nname: Lemongrass\ntagSlugs: [leaf, edible]\noverview: a tall grass\n---\nBody C\n")
    write(d, "content/recipeGroups.yaml",
      """- slug: recipeGroup001
        |  processSlug: infusion
        |  combinedHerbs:
        |    - slug: arctium-lappa
        |      herbStateSlug: dry
        |- slug: recipeGroup002
        |  processSlug: infusion
        |  combinedHerbs:
        |    - slug: centella-asiatica
        |      herbStateSlug: dry
        |    - slug: cymbopogon-citratus
        |      herbStateSlug: dry
        |""".stripMargin)
    write(d, "content/recipes/recipeGroup001/001.md",
      "---\nrecipeGroupSlug: recipeGroup001\nrecipe: [measure, steep, strain]\n---\nRoot tea\n")
    write(d, "content/recipes/recipeGroup002/001.md",
      "---\nrecipeGroupSlug: recipeGroup002\nrecipe: [mix, steep]\n---\nCalming tea\n")
    write(d, "content/processes.yaml",
      "- slug: infusion\n  name: Infusion\n")
    d
  }

  private val config =
    """{
      |  "sources": {
      |    "herbs": {
      |      "type": "markdown",
      |      "pattern": "content/herbs/*.md",
      |      "schema": {"type": "object", "required": ["name", "tagSlugs", "overview"]},
      |      "relations": {
      |        "recipes": {
      |          "to": "recipes", "through": "recipeGroups",
      |          "sourceLocalKey": "slug", "throughForeignKey": "combinedHerbs.slug",
      |          "throughLocalKey": "slug", "targetForeignKey": "recipeGroupSlug",
      |          "type": "hasManyThrough"
      |        }
      |      },
      |      "index": {"name": {}, "tagSlugs": {}}
      |    },
      |    "recipes": {
      |      "type": "markdown",
      |      "pattern": "content/recipes/**/*.md",
      |      "schema": {"type": "object", "required": ["recipeGroupSlug", "recipe"]},
      |      "relations": {
      |        "herbs": {
      |          "to": "herbs", "through": "recipeGroups",
      |          "sourceLocalKey": "recipeGroupSlug", "throughForeignKey": "slug",
      |          "throughLocalKey": "combinedHerbs.slug", "targetForeignKey": "slug",
      |          "type": "hasManyThrough"
      |        },
      |        "process": {
      |          "to": "processes", "through": "recipeGroups",
      |          "sourceLocalKey": "recipeGroupSlug", "throughForeignKey": "slug",
      |          "throughLocalKey": "processSlug", "targetForeignKey": "slug",
      |          "type": "hasOneThrough"
      |        }
      |      },
      |      "index": {"herbs.slug": {}}
      |    },
      |    "recipeGroups": {
      |      "type": "yaml",
      |      "pattern": "content/recipeGroups.yaml",
      |      "schema": {"type": "object", "required": ["slug", "processSlug", "combinedHerbs"]}
      |    },
      |    "processes": {
      |      "type": "yaml",
      |      "pattern": "content/processes.yaml",
      |      "schema": {"type": "object", "required": ["slug", "name"]}
      |    }
      |  }
      |}""".stripMargin

  private lazy val cat = GraftConfig.catalog(spark, root.toString, config)

  test("config parses: sources, relations, index fields") {
    val specs = GraftConfig.parse(config)
    assert(specs.map(_.name).toSet == Set("herbs", "recipes", "recipeGroups", "processes"))
    val herbs = specs.find(_.name == "herbs").get
    assert(herbs.indexFields == Set("name", "tagSlugs"))
    assert(herbs.relations("recipes").isInstanceOf[HasManyThrough])
  }

  test("reference query.test.ts: eq on slug finds the herb by name") {
    val r = cat.from("herbs").where("slug", Eq, "arctium-lappa").exec()
    assert(r.data.map(_.getAs[String]("name")) == Seq("Burdock"))
  }

  test("reference query.test.ts: join through + relation filter attaches ALL herbs") {
    val r = cat.from("recipes")
      .join("herbs")
      .where("herbs.slug", In, Seq("centella-asiatica"))
      .exec()
    assert(r.data.length == 1)
    assert(r.data.head.getAs[String]("slug") == "recipeGroup002--001")
    val attached = r.data.head.getAs[scala.collection.Seq[Row]]("herbs")
    assert(attached.map(_.getAs[String]("slug")).sorted ==
      Seq("centella-asiatica", "cymbopogon-citratus"))
  }

  test("hasOneThrough via config: recipe -> process struct") {
    val r = cat.from("recipes").join("process").orderBy("slug").exec()
    assert(r.data.forall(_.getAs[Row]("process").getAs[String]("name") == "Infusion"))
  }

  test("herbs -> recipes through combinedHerbs.slug (nested through key)") {
    val r = cat.from("herbs").join("recipes")
      .where("slug", Eq, "cymbopogon-citratus").exec()
    val recipes = r.data.head.getAs[scala.collection.Seq[Row]]("recipes")
    assert(recipes.map(_.getAs[String]("slug")) == Seq("recipeGroup002--001"))
  }

  test("needs-index guard active for config catalogs") {
    val e = intercept[IllegalArgumentException](
      cat.from("herbs").where("overview", Eq, "a root vegetable").exec())
    assert(e.getMessage.contains("needs index"))
  }

  test("pagination over config sources (reference pagination scenario)") {
    val first = cat.from("herbs").orderBy("name").pageSize(2).exec()
    assert(first.data.map(_.getAs[String]("slug")) ==
      Seq("arctium-lappa", "centella-asiatica"))
    val second = cat.from("herbs").orderBy("name").pageSize(2)
      .cursor(first.pageInfo.endCursor.get).exec()
    assert(second.data.map(_.getAs[String]("slug")) == Seq("cymbopogon-citratus"))
    assert(second.pageInfo.hasPreviousPage && !second.pageInfo.hasNextPage)
  }

  test("saveIndexes builds prefix indexes for configured fields; lookup prunes") {
    val idxDir = Files.createTempDirectory("graft-cfg-idx").toString
    GraftConfig.saveIndexes(spark, cat, idxDir)
    val hit = graft.operators.Indexing.lookup(spark, s"$idxDir/herbs", "tagSlugs", "edible")
    assert(hit.select("slug").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("arctium-lappa", "cymbopogon-citratus"))
  }

  test("saveIndexes honors per-field indexDepth: 2-char partitions + pruned lookup") {
    val cfg = config.replace("\"index\": {\"name\": {}, \"tagSlugs\": {}}",
      "\"index\": {\"name\": {\"indexDepth\": 2}, \"tagSlugs\": {}}")
    val cat2 = GraftConfig.catalog(spark, root.toString, cfg)
    assert(cat2("herbs").depthOf("name") == 2 && cat2("herbs").depthOf("tagSlugs") == 1)
    val idxDir = Files.createTempDirectory("graft-cfg-idx2").toString
    GraftConfig.saveIndexes(spark, cat2, idxDir)
    // Depth 2 for name ("Burdock" → prefix=bu), depth 1 default for tagSlugs.
    assert(new java.io.File(s"$idxDir/herbs/field=name/prefix=bu").exists())
    assert(!new java.io.File(s"$idxDir/herbs/field=name/prefix=b").exists())
    assert(new java.io.File(s"$idxDir/herbs/field=tagSlugs/prefix=e").exists())
    val hit = graft.operators.Indexing.lookup(spark, s"$idxDir/herbs", "name", "Burdock", depth = 2)
    assert(hit.select("slug").collect().map(_.getString(0)).toSeq == Seq("arctium-lappa"))
    assert(hit.queryExecution.executedPlan.toString.contains("PartitionFilters"))
  }

  test("customIndex fields index via registered name->Column hook (with depth)") {
    val cfg = config.replace("\"index\": {\"name\": {}, \"tagSlugs\": {}}",
      "\"index\": {\"name\": {}, \"tagSlugs\": {}},\n" +
        "      \"customIndex\": {\"nameInitial\": {\"indexDepth\": 1}}")
    val cat2 = GraftConfig.catalog(spark, root.toString, cfg)
    assert(cat2("herbs").customIndexFields == Set("nameInitial"))
    val idxDir = Files.createTempDirectory("graft-cfg-idx3").toString
    // No hook registered for a declared custom field → error, not a silent skip.
    val e = intercept[IllegalArgumentException](GraftConfig.saveIndexes(spark, cat2, idxDir))
    assert(e.getMessage.contains("nameInitial"))
    import org.apache.spark.sql.functions._
    GraftConfig.saveIndexes(spark, cat2, idxDir, customIndexers =
      Map("herbs" -> Map("nameInitial" -> (df => array(upper(substring(col("name"), 1, 1)))))))
    val hit = graft.operators.Indexing.lookup(spark, s"$idxDir/herbs", "nameInitial", "L")
    assert(hit.select("slug").collect().map(_.getString(0)).toSeq == Seq("cymbopogon-citratus"))
    // Schema fields still index alongside the custom one.
    assert(new java.io.File(s"$idxDir/herbs/field=name/prefix=b").exists())
  }

  test("customIndex fields are queryable when the hook is given at catalog time") {
    val cfg = config.replace("\"index\": {\"name\": {}, \"tagSlugs\": {}}",
      "\"index\": {\"name\": {}, \"tagSlugs\": {}},\n" +
        "      \"customIndex\": {\"nameInitial\": {}}")
    import org.apache.spark.sql.functions._
    val cat2 = GraftConfig.catalog(spark, root.toString, cfg, customIndexers =
      Map("herbs" -> Map("nameInitial" -> (df => upper(substring(col("name"), 1, 1))))))
    // Reference parity: extractIndexFilters treats EVERY indexes-map key as
    // filterable, customIndex included.
    val r = cat2.from("herbs").where("nameInitial", Eq, "L").exec()
    assert(r.data.map(_.getAs[String]("slug")) == Seq("cymbopogon-citratus"))
    // ...but hook values never surface as record data (the reference's
    // customIndexers feed only the index)
    assert(!r.data.head.schema.fieldNames.contains("nameInitial"))
    assert(!r.data.head.schema.fieldNames.exists(_.startsWith("__graft_custom_")))
    // queries that never touch the custom field don't evaluate the hook at
    // all — Catalyst prunes the internal column out of the physical plan
    val untouched = cat2.from("herbs").orderBy("name").execDf()
    assert(!untouched.queryExecution.executedPlan.toString.contains("__graft_custom_"))
    // Without the hook the derived column cannot exist → not queryable.
    val cat3 = GraftConfig.catalog(spark, root.toString, cfg)
    val e = intercept[IllegalArgumentException](
      cat3.from("herbs").where("nameInitial", Eq, "L").exec())
    assert(e.getMessage.contains("needs index"))
    // saveIndexes reuses the catalog-materialized column (no hook re-passed),
    // normalizing the scalar hook value to the index's array shape.
    val idxDir = Files.createTempDirectory("graft-cfg-idx4").toString
    GraftConfig.saveIndexes(spark, cat2, idxDir)
    val hit = graft.operators.Indexing.lookup(spark, s"$idxDir/herbs", "nameInitial", "L")
    assert(hit.select("slug").collect().map(_.getString(0)).toSeq == Seq("cymbopogon-citratus"))
    // The schema-indexed fields still wrote once each alongside the custom one.
    assert(new java.io.File(s"$idxDir/herbs/field=name/prefix=b").exists())
  }

  test("orderBy on a customIndex field sorts by hook values; cursor round-trips") {
    val cfg = config.replace("\"index\": {\"name\": {}, \"tagSlugs\": {}}",
      "\"index\": {\"name\": {}, \"tagSlugs\": {}},\n" +
        "      \"customIndex\": {\"nameRev\": {}}")
    import org.apache.spark.sql.functions._
    val cat2 = GraftConfig.catalog(spark, root.toString, cfg, customIndexers =
      Map("herbs" -> Map("nameRev" -> (df => reverse(col("name"))))))
    // reversed names sort: "aloK utoG" < "kcodruB" < "ssargnomeL"
    val first = cat2.from("herbs").orderBy("nameRev").pageSize(2).exec()
    assert(first.data.map(_.getAs[String]("slug")) ==
      Seq("centella-asiatica", "arctium-lappa"))
    assert(!first.data.head.schema.fieldNames.exists(_.startsWith("__graft_custom_")))
    // the cursor minted under the custom order key pages correctly
    val second = cat2.from("herbs").orderBy("nameRev").pageSize(2)
      .cursor(first.pageInfo.endCursor.get).exec()
    assert(second.data.map(_.getAs[String]("slug")) == Seq("cymbopogon-citratus"))
    assert(second.pageInfo.hasPreviousPage && !second.pageInfo.hasNextPage)
  }

  test("customIndex hook sharing a data column's name never shadows record data") {
    val cfg = config.replace("\"index\": {\"name\": {}, \"tagSlugs\": {}}",
      "\"index\": {\"name\": {}, \"tagSlugs\": {}},\n" +
        "      \"customIndex\": {\"name\": {}}")
    import org.apache.spark.sql.functions._
    val cat2 = GraftConfig.catalog(spark, root.toString, cfg, customIndexers =
      Map("herbs" -> Map("name" -> (df => upper(substring(col("name"), 1, 1))))))
    // filter on 'name' uses the HOOK values (the custom definition won)...
    val r = cat2.from("herbs").where("name", Eq, "L").exec()
    assert(r.data.map(_.getAs[String]("slug")) == Seq("cymbopogon-citratus"))
    // ...while the record's own 'name' column still carries source data
    assert(r.data.head.getAs[String]("name") == "Lemongrass")
  }

  test("foreign-source custom columns never leak into nested join structs") {
    val cfg = config.replace("\"pattern\": \"content/processes.yaml\",",
      "\"pattern\": \"content/processes.yaml\",\n      \"customIndex\": {\"nameInitial\": {}},")
    import org.apache.spark.sql.functions._
    val cat2 = GraftConfig.catalog(spark, root.toString, cfg, customIndexers =
      Map("processes" -> Map("nameInitial" -> (df => upper(substring(col("name"), 1, 1))))))
    val r = cat2.from("recipes").join("process").orderBy("slug").exec()
    val processStruct = r.data.head.getAs[Row]("process")
    assert(!processStruct.schema.fieldNames.exists(_.startsWith("__graft_custom_")))
    assert(processStruct.getAs[String]("name") == "Infusion")
  }

  test("index/customIndex name collision: the custom definition wins") {
    val cfg = config.replace("\"index\": {\"name\": {}, \"tagSlugs\": {}}",
      "\"index\": {\"name\": {\"indexDepth\": 2}, \"tagSlugs\": {}},\n" +
        "      \"customIndex\": {\"name\": {\"indexDepth\": 3}}")
    val herbs = GraftConfig.parse(cfg).find(_.name == "herbs").get
    // Reference folds both blocks into one indexes map with customIndex
    // assigned last (IndexConfigFactory.ts:82) — later assignment wins.
    assert(herbs.indexFields == Set("tagSlugs"))
    assert(herbs.customIndex == Map("name" -> 3))
    assert(herbs.depthOf("name") == 3)
  }

  test("schema validation rejects a bad record at load") {
    val bad = Files.createTempDirectory("graft-bad")
    write(bad, "content/herbs/x.md", "---\nname: NoOverview\n---\n")
    val e = intercept[Exception] {
      GraftConfig.catalog(spark, bad.toString, config).from("herbs").exec()
    }
    assert(e.getMessage.contains("required") || e.getMessage.contains("Missing"))
  }
}
