package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-markdown` — a DataSource V2 connector for markdown + front-matter
  * document trees, the reference's primary source format
  * (reference: src/parser/frontMatter.ts, src/SourceLoader.ts) expressed as
  * a first-class Spark table instead of a load helper:
  *
  * {{{
  *   spark.read.format("graft-markdown").load(markdownGlob) // e.g. content dir or a .md glob
  * }}}
  *
  * What being a REAL connector buys over [[StaticSources.load]] (which
  * stays — it is the parser-injection / multi-format path):
  *
  *  - **Column pruning pushdown** (`SupportsPushDownRequiredColumns`): a
  *    `peek`-shaped projection (`select("slug", "title")`) reaches the scan,
  *    which then never materializes the body string into rows — on a
  *    100 TB tree where bodies are ~99% of the bytes, every downstream
  *    exchange after the scan is index-sized. (The file is still READ — the
  *    front matter lives inside it; what pruning saves is row width, which
  *    is what rides shuffles and fills memory.)
  *  - **Size-aware partition planning**: files are bin-packed into input
  *    partitions against `spark.sql.files.maxPartitionBytes` (+ the
  *    standard per-file open cost), so a million tiny markdown files don't
  *    become a million tasks, and one partition never gets a pathological
  *    byte share.
  *  - **Schema stability without a pre-pass**: the schema comes from a
  *    bounded driver-side sample (`sampleFiles`, default 16 — NOT a full
  *    corpus scan like JSON inference), and `.schema(...)` skips even that
  *    (`supportsExternalMetadata`).
  *
  * Row model mirrors the reference loader: one row per file — `slug`
  * (path-derived, `/` → `--`), the front-matter attributes, `body`.
  * Attribute values missing from a file are null (schema-on-read, like the
  * JSON source); nested maps/lists under a string-typed field render as
  * canonical JSON.
  */
class MarkdownSourceV2 extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-markdown"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MarkdownSourceV2.inferSchema(options)

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new MarkdownTable(schema,
      MarkdownSourceV2.pattern(new CaseInsensitiveStringMap(properties)))
}

private[sources] object MarkdownSourceV2 {

  def pattern(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty,
      "graft-markdown: a path is required — spark.read.format(\"graft-markdown\").load(<glob>)")
    p
  }

  /** Driver-side file listing: glob, or directory (its *.md children). */
  def listFiles(pattern: String, conf: Configuration): Seq[FileStatus] = {
    val path = new Path(pattern)
    val fs = path.getFileSystem(conf)
    val matched = Option(fs.globStatus(path)).map(_.toSeq).getOrElse(Seq.empty)
    matched.flatMap { s =>
      if (s.isDirectory)
        fs.listStatus(s.getPath).toSeq.filter(c => c.isFile && c.getPath.getName.endsWith(".md"))
      else Seq(s)
    }.sortBy(_.getPath.toString) // deterministic partition planning
  }

  /** Bounded-sample schema inference: parse the front matter of the first
    * `sampleFiles` files (path order), union the keys, infer scalar types,
    * widen on conflict (long+double → double, anything else → string).
    */
  def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val pat = pattern(options)
    val sample = math.max(1, options.getInt("samplefiles", 16))
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val files = listFiles(pat, conf).take(sample)
    require(files.nonEmpty, s"graft-markdown: no files match '$pat'")
    var types = Map.empty[String, DataType]
    var order = Vector.empty[String]
    files.foreach { st =>
      val (attrs, _) = FrontMatter.parse(readFully(st.getPath, st.getLen, conf))
      attrs.foreach { case (k, v) =>
        if (k != "slug" && k != "body") {
          val t = typeOf(v)
          types.get(k) match {
            case None           => types += k -> t; order :+= k
            case Some(old)      => types += k -> widen(old, t)
          }
        }
      }
    }
    StructType(
      StructField("slug", StringType, nullable = false) +:
      order.map(k => StructField(k, types(k), nullable = true)) :+
      StructField("body", StringType, nullable = true))
  }

  private def typeOf(v: Any): DataType = v match {
    case _: Boolean => BooleanType
    case _: Int | _: Long => LongType
    case _: Double => DoubleType
    case s: Seq[_] if s.forall(x => x == null || x.isInstanceOf[String]) =>
      ArrayType(StringType)
    case _ => StringType // strings, nested maps, mixed lists → JSON string
  }

  private def widen(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y                    => x
    case (LongType, DoubleType)              => DoubleType
    case (DoubleType, LongType)              => DoubleType
    case _                                   => StringType
  }

  def readFully(path: Path, len: Long, conf: Configuration): String = {
    require(len <= Int.MaxValue, s"graft-markdown: $path exceeds 2 GB")
    val fs = path.getFileSystem(conf)
    val in = fs.open(path)
    try {
      val buf = new Array[Byte](len.toInt)
      in.readFully(0, buf)
      new String(buf, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }
}

private[sources] class MarkdownTable(tableSchema: StructType, pattern: String)
    extends Table with SupportsRead {
  override def name(): String = s"graft-markdown:`$pattern`"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MarkdownScanBuilder(tableSchema, pattern, options)
}

private[sources] class MarkdownScanBuilder(fullSchema: StructType, pattern: String,
                                           options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    // Catalyst hands us the projection it needs; an empty projection
    // (count(*)) still reads files but emits zero-width rows.
    required = requiredSchema

  override def build(): Scan = {
    val session = SparkSession.active
    // Bin-pack target: explicit option > session conf. Parsed with the
    // standard byte-suffix grammar ("128m", "1048576").
    val target = Option(options.get("maxpartitionbytes"))
      .getOrElse(session.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
    val openCost = session.conf.get("spark.sql.files.openCostInBytes", "4194304")
    // Serialize the Hadoop conf as key-values (SerializableConfiguration is
    // private[spark]) so executor-side FileSystem access sees the session's
    // filesystem settings, not bare defaults.
    val hconf = session.sessionState.newHadoopConf()
    // Qualify NOW (scheme + absolute base) so slug derivation on executors
    // anchors unambiguously — file paths arrive Hadoop-qualified, and a
    // relative base could first-match inside a parent segment that happens
    // to repeat the base name (same discipline as StaticSources.load).
    new MarkdownScan(required, StaticSources.qualifyPattern(pattern, hconf),
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(target),
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(openCost),
      hconf.asScala.map(e => (e.getKey, e.getValue)).toArray)
  }
}

private[sources] case class MarkdownFile(path: String, length: Long)

private[sources] case class MarkdownPartition(files: Array[MarkdownFile])
    extends InputPartition

private[sources] class MarkdownScan(required: StructType, pattern: String,
                                    targetBytes: Long, openCost: Long,
                                    confKVs: Array[(String, String)])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-markdown $pattern, ReadSchema: ${required.simpleString}"

  /** Sequential greedy bin packing over size-DESC files against
    * max(targetBytes, largest file) — the same one-pass O(n) scheme as
    * Spark's own `FilePartition.getFilePartitions` (first-fit over all
    * open bins is O(files × bins): quadratic planning at the
    * million-tiny-files scale this connector exists for). Tasks get
    * balanced byte shares and tiny files coalesce instead of fanning into
    * per-file tasks.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val conf = new Configuration(false)
    confKVs.foreach { case (k, v) => conf.set(k, v) }
    val files = MarkdownSourceV2.listFiles(pattern, conf)
      .map(s => MarkdownFile(s.getPath.toString, s.getLen))
    if (files.isEmpty) return Array.empty
    def cost(f: MarkdownFile): Long = f.length + openCost
    val cap = math.max(targetBytes, files.map(cost).max)
    val bins = scala.collection.mutable.ArrayBuffer.empty[InputPartition]
    val current = scala.collection.mutable.ArrayBuffer.empty[MarkdownFile]
    var used = 0L
    files.sortBy(f => (-cost(f), f.path)).foreach { f =>
      if (used + cost(f) > cap && current.nonEmpty) {
        bins += MarkdownPartition(current.toArray); current.clear(); used = 0L
      }
      current += f; used += cost(f)
    }
    if (current.nonEmpty) bins += MarkdownPartition(current.toArray)
    bins.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MarkdownReaderFactory(required, pattern, confKVs)
}

private[sources] class MarkdownReaderFactory(required: StructType, pattern: String,
                                             confKVs: Array[(String, String)])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new MarkdownPartitionReader(
      partition.asInstanceOf[MarkdownPartition].files, required, pattern, confKVs)
}

private[sources] class MarkdownPartitionReader(files: Array[MarkdownFile],
                                               required: StructType, pattern: String,
                                               confKVs: Array[(String, String)])
    extends PartitionReader[InternalRow] {
  private val conf = {
    val c = new Configuration(false)
    confKVs.foreach { case (k, v) => c.set(k, v) }
    c
  }
  // `slug` derives from the PATH alone, so a projection needing nothing
  // else (count(*), slug-only peeks) must not read file bytes at all —
  // on the tree this connector exists for, a row count or slug listing
  // is then metadata-only.
  private val pathOnly = required.fieldNames.forall(_ == "slug")
  private var i = -1
  private var current: InternalRow = _

  override def next(): Boolean = {
    i += 1
    if (i >= files.length) return false
    val f = files(i)
    val (attrs, body) =
      if (pathOnly) (Map.empty[String, Any], "")
      else FrontMatter.parse(
        MarkdownSourceV2.readFully(new Path(f.path), f.length, conf))
    val slug = StaticSources.slugFromPath(pattern, f.path)
    val values: Array[Any] = required.fields.map { field =>
      field.name match {
        case "slug" => UTF8String.fromString(slug)
        case "body" => UTF8String.fromString(body)
        case n      => toCatalyst(attrs.get(n).orNull, field.dataType)
      }
    }
    current = new GenericInternalRow(values)
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()

  /** Schema-on-read conversion — a value that doesn't fit its column type
    * becomes null, matching the JSON source's permissive semantics.
    */
  private def toCatalyst(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _)                      => null
    case (s: String, StringType)        => UTF8String.fromString(s)
    case (other, StringType)            => UTF8String.fromString(MiniYaml.toJson(other))
    case (b: Boolean, BooleanType)      => b
    case (l: Long, LongType)            => l
    case (i: Int, LongType)             => i.toLong
    case (d: Double, LongType) if d == d.floor && math.abs(d) < 9.007199254740992e15 =>
      d.toLong
    case (d: Double, DoubleType)        => d
    case (l: Long, DoubleType)          => l.toDouble
    case (i: Int, DoubleType)           => i.toDouble
    case (s: Seq[_], ArrayType(StringType, _)) =>
      new GenericArrayData(s.map {
        case null      => null
        case e: String => UTF8String.fromString(e)
        case e         => UTF8String.fromString(MiniYaml.toJson(e))
      }.toArray[Any])
    case _                              => null
  }
}
