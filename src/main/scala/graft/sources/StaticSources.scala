package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Static-file sources → DataFrames: the reference's ingestion half
  * (reference: src/SourceLoader.ts:30-80, src/parser/index.ts:32-50) made
  * distributed.
  *
  * Execution model: file listing + whole-file read happen through Spark's file
  * source (partitioned across executors); each file parses *inside its
  * executor* into canonical JSON lines; `spark.read.json` then infers one
  * schema across all records (a distributed job, not a driver loop). At 100 TB
  * the parse is embarrassingly parallel and the only global step is schema
  * inference — which callers can skip by passing an explicit schema.
  *
  * Parser injection mirrors the reference (reference: src/parser/index.ts:54
  * `registerParser`, README "Parser Injection"): a parser is
  * `content => records-AST`, registered per format key.
  */
object StaticSources {

  /** A parser takes raw file content and yields the parsed AST
    * (Map / List / scalars — see [[MiniYaml]]/[[MiniJson]]).
    */
  type Parser = String => Any

  val defaultParsers: Map[String, Parser] = Map(
    "markdown" -> (raw => FrontMatter.parse(raw)._1),
    "yaml"     -> (raw => MiniYaml.parse(raw)),
    "json"     -> (raw => MiniJson.parse(raw))
  )

  /** Fully qualify a glob pattern (scheme + absolute base) so slug
    * derivation anchors at an unambiguous position: file paths arrive
    * Hadoop-qualified (`file:/...`), and matching a RELATIVE base inside
    * them can hit a parent segment that merely repeats the base name.
    * Shared by [[load]] and the `graft-markdown` DSv2 connector.
    */
  def qualifyPattern(pattern: String, conf: org.apache.hadoop.conf.Configuration): String = {
    val prefix = pattern.takeWhile(_ != '*')
    val suffix = pattern.drop(prefix.length)
    val base   = new org.apache.hadoop.fs.Path(if (prefix.isEmpty) "." else prefix)
    val fs     = base.getFileSystem(conf)
    var qBase  = fs.makeQualified(base).toString
    // Path() drops trailing slashes; restore the segment boundary
    if (prefix.endsWith("/") && !qBase.endsWith("/")) qBase += "/"
    qBase + suffix
  }

  /** Slug from file path relative to the glob's base dir, `/` encoded as `--`
    * (reference: src/SourceConfigResolver.ts:175-190).
    */
  def slugFromPath(pattern: String, filePath: String): String = {
    val baseDir = pattern.split("/").takeWhile(p => !p.contains("*")).mkString("/") match {
      case "" => ""
      case d  => d + "/"
    }
    // extension of the FINAL segment only — a dot in a parent directory
    // ("archive.old/readme") is not an extension
    val lastSeg = filePath.split("/").last
    val ext = lastSeg.lastIndexOf('.') match {
      case -1 => ""
      case i  => lastSeg.substring(i)
    }
    // match the glob base only at a path-segment boundary — a parent dir that
    // merely ENDS with the base name ("/mycontent/" vs base "content/") must
    // not anchor the slug. An absolute base carries its own leading-slash
    // boundary (file paths arrive as "file:/abs/..." URIs).
    val marker = if (baseDir.startsWith("/")) baseDir else "/" + baseDir
    var rel =
      if (baseDir.nonEmpty && filePath.startsWith(baseDir))
        filePath.substring(baseDir.length)
      else if (baseDir.nonEmpty && filePath.contains(marker))
        filePath.substring(filePath.indexOf(marker) + marker.length)
      else filePath.split("/").last
    if (rel.startsWith("/")) rel = rel.substring(1)
    rel.stripSuffix(ext).replace("/", "--")
  }

  /** AST → records: an array file contributes one record per element
    * (keeping its own slug field); an object file is one record whose slug
    * defaults from the path (reference: src/SourceLoader.ts:60-76).
    */
  private def records(ast: Any, slug: String): Seq[Map[String, Any]] = ast match {
    case l: Seq[_] =>
      l.collect { case m: Map[_, _] => m.asInstanceOf[Map[String, Any]] }
    case m: Map[_, _] =>
      // object files take the path-derived slug UNCONDITIONALLY, like the
      // reference's bulk loader (src/SourceLoader.ts:70 `parsed.slug = ...`)
      Seq(m.asInstanceOf[Map[String, Any]] + ("slug" -> slug))
    case _ => Seq.empty
  }

  /** Load every file matching `pattern` as one DataFrame. `format` picks the
    * parser from `parsers` (inject custom formats — e.g. CSV — by extending
    * the map, exactly like the reference's `registerParser`).
    */
  /** `includeRaw = true` adds a `raw` column holding the whole file content —
    * the reference attaches `raw` on per-slug loads (src/SourceLoader.ts:108).
    * `schema` drives per-record validation (the reference's ingest-time
    * validation); `sparkSchema` skips the distributed schema-inference pass
    * entirely — the scale path for large corpora with a known contract.
    */
  def load(
      spark: SparkSession,
      pattern: String,
      format: String,
      parsers: Map[String, Parser] = defaultParsers,
      schema: Option[Map[String, Any]] = None,
      includeRaw: Boolean = false,
      sparkSchema: Option[org.apache.spark.sql.types.StructType] = None
  ): DataFrame = {
    val parser = parsers.getOrElse(format,
      throw new IllegalArgumentException(s"No parser registered for type: $format"))
    import spark.implicits._
    // Fully qualify the pattern (scheme + absolute path) for slug derivation:
    // `_metadata.file_path` arrives qualified, and an absolute anchor removes
    // any ambiguity about WHERE the glob base occurs inside the path (a cwd
    // or parent segment that happens to repeat the base name).
    val qualifiedPattern =
      qualifyPattern(pattern, spark.sparkContext.hadoopConfiguration)
    val files: Dataset[(String, String)] = spark.read
      .option("wholetext", "true")
      .text(pattern)
      .select(col("_metadata.file_path").as("path"), col("value"))
      .as[(String, String)]
    // Per-file parse (+ optional schema validation, reference: SourceLoader
    // validates each record on load) on executors; canonical JSON lines out.
    val jsonLines: Dataset[String] = files.flatMap { case (path, content) =>
      val recs = records(parser(content), slugFromPath(qualifiedPattern, path))
      schema.foreach(sc => recs.foreach(r => Validation.validateRecord(r, sc)))
      val out = if (includeRaw) recs.map(_ + ("raw" -> content)) else recs
      out.map(MiniYaml.toJson)
    }
    sparkSchema match {
      case Some(s) => spark.read.schema(s).json(jsonLines)
      case None    => spark.read.json(jsonLines)
    }
  }
}
