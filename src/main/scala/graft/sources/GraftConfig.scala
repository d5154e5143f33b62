package graft.sources

import org.apache.spark.sql.SparkSession

import graft.api._
import graft.operators.Indexing

/** Config-driven setup — the `defineStaticQL(config)` equivalent
  * (reference: src/index.ts, src/SourceConfigResolver.ts, README
  * "Configuration"): parse a `staticql.config.json`, build a [[Catalog]] of
  * parsed static-file sources with their relations, schemas and indexed
  * fields, and build/save the prefix indexes.
  *
  * A reference user's config file works as-is: same source/relation/index JSON
  * shape, same "needs index" guard on non-indexed filters, same slug
  * semantics.
  */
object GraftConfig {

  final case class SourceSpec(
      name: String,
      format: String,
      pattern: String,
      schema: Option[Map[String, Any]],
      relations: Map[String, Relation],
      indexFields: Set[String],
      indexDepths: Map[String, Int] = Map.empty,
      customIndex: Map[String, Int] = Map.empty) {
    /** Prefix depth for `field` (schema or custom index), default 1. A field
      * declared in both blocks resolves to the CUSTOM depth — the reference
      * builds one `indexes` map where the customIndex assignment lands last
      * (src/IndexConfigFactory.ts:82), so later-assignment-wins.
      */
    def depthOf(field: String): Int =
      customIndex.getOrElse(field, indexDepths.getOrElse(field, 1))
  }

  private def str(m: Map[String, Any], key: String, ctx: String): String =
    m.get(key) match {
      case Some(s: String) => s
      case _ => throw new IllegalArgumentException(s"Missing '$key' in $ctx")
    }

  private[sources] def parseRelation(name: String, m: Map[String, Any]): Relation = {
    val ctx = s"relation $name"
    str(m, "type", ctx) match {
      case "hasOne"        => HasOne(name, str(m, "to", ctx), str(m, "localKey", ctx), str(m, "foreignKey", ctx))
      case "hasMany"       => HasMany(name, str(m, "to", ctx), str(m, "localKey", ctx), str(m, "foreignKey", ctx))
      case "belongsTo"     => BelongsTo(name, str(m, "to", ctx), str(m, "localKey", ctx), str(m, "foreignKey", ctx))
      case "belongsToMany" => BelongsToMany(name, str(m, "to", ctx), str(m, "localKey", ctx), str(m, "foreignKey", ctx))
      case "hasOneThrough" => HasOneThrough(name, str(m, "to", ctx), str(m, "through", ctx),
        str(m, "sourceLocalKey", ctx), str(m, "throughForeignKey", ctx),
        str(m, "throughLocalKey", ctx), str(m, "targetForeignKey", ctx))
      case "hasManyThrough" => HasManyThrough(name, str(m, "to", ctx), str(m, "through", ctx),
        str(m, "sourceLocalKey", ctx), str(m, "throughForeignKey", ctx),
        str(m, "throughLocalKey", ctx), str(m, "targetForeignKey", ctx))
      case other => throw new IllegalArgumentException(s"Unknown relation type: $other")
    }
  }

  /** Parse the reference's config JSON into source specs. */
  def parse(configJson: String): Seq[SourceSpec] = {
    val root = MiniJson.parse(configJson) match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      case _ => throw new IllegalArgumentException("Config root must be an object")
    }
    val sources = root.get("sources") match {
      case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
      case _ => throw new IllegalArgumentException("Config needs a 'sources' object")
    }
    sources.toSeq.map { case (name, raw) =>
      val m = raw.asInstanceOf[Map[String, Any]]
      // A name in both `index` and `customIndex` keeps only the custom
      // definition — the reference folds both blocks into one indexes map
      // with the customIndex assignment last (src/IndexConfigFactory.ts:82),
      // so the custom entry silently replaces the schema one.
      val custom = parseIndexDepths(name, m, "customIndex")
      SourceSpec(
        name = name,
        format = str(m, "type", s"source $name"),
        pattern = str(m, "pattern", s"source $name"),
        schema = m.get("schema").map(_.asInstanceOf[Map[String, Any]]),
        relations = m.get("relations").map(_.asInstanceOf[Map[String, Any]].map {
          case (rn, rm) => rn -> parseRelation(rn, rm.asInstanceOf[Map[String, Any]])
        }).getOrElse(Map.empty),
        indexFields = m.get("index").map(_.asInstanceOf[Map[String, Any]].keySet)
          .getOrElse(Set.empty) -- custom.keySet,
        indexDepths = parseIndexDepths(name, m, "index") -- custom.keySet,
        customIndex = custom)
    }
  }

  /** Per-field `indexDepth` of an `index`/`customIndex` block, validated to
    * the reference's 1-10 range with its error message shape
    * (reference: src/IndexConfigFactory.ts:46-59,85-99). Default depth 1.
    */
  private def parseIndexDepths(source: String, m: Map[String, Any], key: String): Map[String, Int] =
    m.get(key).map(_.asInstanceOf[Map[String, Any]].map { case (field, defn) =>
      val depth = defn match {
        case dm: Map[_, _] => dm.asInstanceOf[Map[String, Any]].get("indexDepth") match {
          case None            => 1
          case Some(l: Long)   => l.toInt
          case Some(d: Double) => d.toInt
          case Some(other) => throw new IllegalArgumentException(
            s"[$source] indexDepth for field \"$field\" must be a number, got $other")
        }
        case _ => 1
      }
      if (depth < 1 || depth > 10) throw new IllegalArgumentException(
        s"[$source] index depth $depth for field \"$field\" is out of range (1-10)")
      field -> depth
    }).getOrElse(Map.empty)

  /** Build the queryable catalog: every source loaded (parsed, slugged,
    * schema-validated) from `baseDir`. Mirrors `defineStaticQL(config)({repository})`.
    *
    * `customIndexers` (keyed `source -> field`) carries the reference's
    * `customIndexers` callbacks: each hook's Column is materialized onto the
    * source under an INTERNAL column name ([[graft.api.GraftNames.customCol]]),
    * which makes the custom field QUERYABLE exactly like the reference
    * (QueryBuilder.ts extractIndexFilters treats every key of the indexes map
    * — schema or custom — as filterable): filters on the field route to the
    * hook values, while record data stays untouched and query outputs never
    * carry the derived column (the reference's customIndexers feed only the
    * index, never records — so a hook may even share a data column's name
    * without shadowing it). Catalyst prunes the internal column away from
    * queries that never filter on it, so other queries pay nothing. A custom
    * field declared in config but given no hook at catalog time stays
    * UN-queryable (its filter raises the needs-index error) — that state is
    * inexpressible in the reference, whose config module carries the code.
    */
  def catalog(
      spark: SparkSession,
      baseDir: String,
      configJson: String,
      parsers: Map[String, StaticSources.Parser] = StaticSources.defaultParsers,
      enforceIndexes: Boolean = true,
      customIndexers: Map[String, Map[String, org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.Column]] = Map.empty
  ): Catalog = {
    val specs = parse(configJson)
    new Catalog(specs.map { sp =>
      val base  = StaticSources.load(spark, s"$baseDir/${sp.pattern}", sp.format, parsers, sp.schema)
      val hooks = customIndexers.getOrElse(sp.name, Map.empty)
      val hooked = sp.customIndex.keySet.intersect(hooks.keySet).toSeq.sorted
      val df = hooked.foldLeft(base)((d, f) =>
        d.withColumn(graft.api.GraftNames.customCol(f), hooks(f)(d)))
      SourceDef(
        name = sp.name,
        df = df,
        slugField = "slug",
        relations = sp.relations,
        indexedFields = if (enforceIndexes) Some(sp.indexFields ++ hooked) else None,
        indexDepths = sp.indexDepths ++ sp.customIndex,
        customIndexFields = sp.customIndex.keySet)
    })
  }

  /** Build + persist prefix indexes for every indexed field — the
    * `staticql.saveIndexes()` / `staticql-gen-index` equivalent — honoring each
    * field's configured `indexDepth` (default `depth`). Relation-path index
    * keys (e.g. `herbs.slug`) are NOT materialized: relation filters execute
    * as semi-joins against the related source directly, which is the
    * scale-correct equivalent of the reference's relation index files.
    *
    * `customIndexers` supplies the value column for each config `customIndex`
    * field, keyed `source -> field` — the reference's `customIndexers`
    * callbacks (src/IndexConfigFactory.ts:85-99) are functions in its config
    * module, so their Spark shape is a registered DataFrame→Column hook. A
    * declared custom field with no registered indexer is an error (the
    * reference cannot express that state: its config carries the code).
    */
  def saveIndexes(spark: SparkSession, cat: Catalog, outDir: String, depth: Int = 1,
                  customIndexers: Map[String, Map[String, org.apache.spark.sql.DataFrame =>
                    org.apache.spark.sql.Column]] = Map.empty): Unit =
    cat.sources.values.foreach { src =>
      // Custom fields are excluded here even though catalog() lists hooked
      // ones in indexedFields (for the needs-index guard) — they index once,
      // below, through their value column, never twice.
      val own = src.indexedFields.getOrElse(Set.empty)
        .filter(f => !(f.contains('.') && src.relations.contains(f.takeWhile(_ != '.'))))
        .diff(src.customIndexFields)
      val schemaFields = own.toSeq.sorted.map { f =>
        Indexing.IndexField(f, src.depthOf(f, depth), FieldPath.resolve(src.df, f))
      }
      val hooks = customIndexers.getOrElse(src.name, Map.empty)
      val customFields = src.customIndexFields.toSeq.sorted.map { f =>
        // Value column priority: an explicit hook here, else the INTERNAL
        // column `catalog(customIndexers = ...)` materialized (never a data
        // column that merely shares the field's name — silently indexing raw
        // data for a custom field would invert the contract). A custom field
        // with neither is an error, not a silent skip. Scalar hooks (one
        // value per record) are normalized to single-element arrays — the
        // index relation explodes multi-valued fields.
        val internal = graft.api.GraftNames.customCol(f)
        val valueCol = hooks.get(f).map(_(src.df)).orElse(
          if (src.df.columns.contains(internal))
            Some(org.apache.spark.sql.functions.col(internal))
          else None
        ).getOrElse(throw new IllegalArgumentException(
          s"[${src.name}] customIndex field \"$f\" has no registered indexer"))
        val isArray = src.df.select(valueCol.as("v")).schema.head.dataType
          .isInstanceOf[org.apache.spark.sql.types.ArrayType]
        val arrCol = if (isArray) valueCol else org.apache.spark.sql.functions.array(valueCol)
        Indexing.IndexField(f, src.depthOf(f, depth), arrCol)
      }
      val all = schemaFields ++ customFields
      if (all.nonEmpty)
        Indexing.writeIndexResolved(src.df, src.slugField, all, s"$outDir/${src.name}")
    }
}
