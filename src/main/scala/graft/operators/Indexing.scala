package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.api.FieldPath

/** Prefix index over source fields — the Spark re-expression of the
  * reference's prefix-tree index files (reference: src/IndexBuilder.ts,
  * cli/generate-index.ts, src/PrefixTreeWalker.ts).
  *
  * The reference materializes a directory tree `idx/<source>/<field>/<p>/<r>/
  * <e>/...jsonl` walked file-by-file. The 100 TB equivalent: ONE parquet
  * relation `(field, prefix, slug, value)` partitioned by `(field, prefix)` —
  * prefix lookups become partition pruning; value predicates push down into
  * each partition's sorted column chunks; ordered scans are sorted reads.
  * Incremental updates (reference: src/Indexer.ts:70 `updateIndexesForFiles`,
  * src/diff/extractDiff.ts:22) rewrite only affected partitions via dynamic
  * partition overwrite — the untouched prefix space is never rewritten.
  */
object Indexing {

  /** The index relation for `fields` of `df`: one row per (record, field,
    * value) — array/nested fields contribute one row per leaf value, exactly
    * like the reference indexes each value of a multi-valued field.
    */
  def indexRelation(df: DataFrame, slugField: String, fields: Seq[String], depth: Int = 1): DataFrame = {
    require(fields.nonEmpty, "indexRelation needs at least one field to index")
    fields.map { f =>
      df.select(
        lit(f).as("field"),
        col(slugField).cast("string").as("slug"),
        explode(FieldPath.resolve(df, f)).as("value"))
        // lower-then-take, matching lookup/updateIndex's
        // toLowerCase(Locale.ROOT).take — the other order diverges for
        // characters whose lowercase form expands (e.g. İ → "i̇")
        .withColumn("prefix", substring(lower(col("value")), 1, depth))
        .select("field", "prefix", "slug", "value")
    }.reduce(_ unionAll _)
  }

  /** Build (full rebuild): write the index partitioned by (field, prefix),
    * sorted within partitions for ordered scans + min/max pruning.
    */
  def writeIndex(df: DataFrame, slugField: String, fields: Seq[String], path: String,
                 depth: Int = 1): Unit =
    indexRelation(df, slugField, fields, depth)
      .repartition(col("field"), col("prefix"))
      .sortWithinPartitions("field", "prefix", "value", "slug")
      .write
      .partitionBy("field", "prefix")
      .mode("overwrite")
      .parquet(path)

  def readIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Point/prefix lookup: `(field, prefix)` partition pruning + value pushdown.
    * `startsWith=false` → exact match.
    */
  def lookup(spark: SparkSession, path: String, field: String, value: String,
             depth: Int = 1, startsWith: Boolean = false): DataFrame = {
    val pfx = value.toLowerCase(java.util.Locale.ROOT).take(depth)
    val base = readIndex(spark, path)
      .filter(col("field") === field)
      .filter(if (startsWith && value.length < depth) col("prefix").startsWith(value.toLowerCase(java.util.Locale.ROOT))
              else col("prefix") === pfx)
    if (startsWith) base.filter(col("value").startsWith(value))
    else base.filter(col("value") === value)
  }

  /** A diff entry mirroring the reference's `DiffEntry`
    * (reference: src/types.ts, src/diff/extractDiff.ts): A=added, M=modified,
    * D=deleted, with the record's current field values (empty for D).
    */
  final case class DiffEntry(status: String, slug: String, values: Map[String, Seq[String]])

  /** Incremental index update: merges a diff into an existing index rewriting
    * ONLY the `(field, prefix)` partitions that the changed slugs touch (their
    * old rows found by slug — a pushdown-friendly scan — plus their new rows).
    */
  def updateIndex(spark: SparkSession, path: String, diff: Seq[DiffEntry], depth: Int = 1): Unit = {
    import spark.implicits._
    val slugs = diff.map(_.slug)
    val existing = readIndex(spark, path)

    // New rows for A/M entries.
    val newRows = diff
      .filter(d => d.status == "A" || d.status == "M")
      .flatMap(d => d.values.toSeq.flatMap { case (f, vs) =>
        vs.map(v => (f, v.toLowerCase(java.util.Locale.ROOT).take(depth), d.slug, v))
      })
      .toDF("field", "prefix", "slug", "value")

    // Partitions touched by old rows of the changed slugs or by the new rows.
    // This set is bounded by |diff| × values-per-record — safe to collect.
    val oldTouched = existing.filter(col("slug").isin(slugs: _*))
      .select("field", "prefix").distinct()
    val touched = oldTouched.union(newRows.select("field", "prefix").distinct()).distinct()
    val touchedParts = touched.collect().map(r => (r.getString(0), r.getString(1)))

    // Rebuild touched partitions: surviving old rows (other slugs) + new rows.
    val rebuilt = existing
      .join(broadcast(touched), Seq("field", "prefix"), "left_semi")
      .filter(!col("slug").isin(slugs: _*))
      .unionByName(newRows.join(broadcast(touched), Seq("field", "prefix"), "left_semi"))
      .repartition(col("field"), col("prefix"))
      .sortWithinPartitions("field", "prefix", "value", "slug")

    // Durable swap: write the rebuilt partitions to a temp dir FIRST (the old
    // files are still the source of truth while this job runs — no reliance
    // on cached blocks), then delete the touched partitions and rename the
    // new ones in. A crash before the rename loop leaves the index intact;
    // explicit deletion also CLEARS partitions whose rows were all removed
    // (dynamic partition overwrite cannot).
    val hconf   = spark.sparkContext.hadoopConfiguration
    val root    = new org.apache.hadoop.fs.Path(path)
    val fs      = root.getFileSystem(hconf)
    val tmpPath = new org.apache.hadoop.fs.Path(path + "__graft_update_tmp")
    if (fs.exists(tmpPath)) fs.delete(tmpPath, true)
    rebuilt.write
      .partitionBy("field", "prefix")
      .mode("overwrite")
      .parquet(tmpPath.toString)
    // Partition dirs on disk are Hive-escaped by Spark's writer (':' → %3A,
    // empty → __HIVE_DEFAULT_PARTITION__, …) — build paths the same way or
    // special-character prefixes would silently never swap.
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.getPartitionPathString
    touchedParts.foreach { case (f, p) =>
      val rel    = s"${getPartitionPathString("field", f)}/${getPartitionPathString("prefix", p)}"
      val oldDir = new org.apache.hadoop.fs.Path(root, rel)
      val newDir = new org.apache.hadoop.fs.Path(tmpPath, rel)
      if (fs.exists(oldDir)) fs.delete(oldDir, true)
      if (fs.exists(newDir)) {
        fs.mkdirs(oldDir.getParent)
        fs.rename(newDir, oldDir)
      }
    }
    fs.delete(tmpPath, true)
  }
}
