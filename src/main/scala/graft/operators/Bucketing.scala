package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table materialization: the storage-level half of the co-located
  * join story (SURVEY §5). A table written with `bucketBy(n, keys)` is
  * pre-shuffled ON DISK — every subsequent equi-join or aggregation on the
  * bucket keys skips its exchange entirely, which is the difference between
  * re-shuffling 100 TB per run and shuffling it once at write time:
  *
  *  - bucketed ⋈ bucketed (same keys, same bucket count): NO exchange on
  *    either side;
  *  - bucketed ⋈ unbucketed (the daily-ingest shape — e.g. a MinHash band
  *    index probed by a new batch): only the SMALL side shuffles, to the
  *    table's bucket count, regardless of how large the indexed corpus is;
  *  - `sortBy` additionally pre-sorts within buckets, letting sort-merge
  *    joins skip their per-run sort.
  *
  * Both plan shapes are pinned in BucketingSpec. Bucket count is a
  * read-parallelism floor AND join-task ceiling: pick ≈ corpus size /
  * target partition size (128–512 MB) at write time; it cannot change
  * without a rewrite.
  */
object Bucketing {

  /** Write `df` as a bucketed (optionally bucket-sorted) parquet table in
    * the session catalog. Overwrites any existing table of that name.
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    keys: Seq[String], sortKeys: Seq[String] = Nil): Unit = {
    clearTable(df.sparkSession, table)
    doWrite(df, table, None, buckets, keys, sortKeys)
  }

  /** [[writeBucketed]] to an EXPLICIT location — the table becomes EXTERNAL,
    * so dropping the catalog entry keeps the files and a later session can
    * re-attach them with [[registerBucketed]] instead of re-shuffling the
    * corpus (the cross-JVM reuse story stored layouts already have).
    */
  def writeBucketedAt(df: DataFrame, table: String, location: String, buckets: Int,
                      keys: Seq[String], sortKeys: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `${escapeIdent(table)}`")
    val loc = new org.apache.hadoop.fs.Path(location)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    doWrite(df, table, Some(location), buckets, keys, sortKeys)
  }

  /** The one writer body behind both entry points — the single-file-per-
    * bucket discipline must never diverge between them: a sorted-bucket
    * write must land ONE file per bucket, or the scan can never report its
    * ordering (FileSourceScanLike claims outputOrdering only when
    * bucketsContainSingleFile()) and every downstream window / merge-join
    * re-sorts data that is already sorted on disk. The repartition on the
    * bucket keys uses the same murmur3-pmod hash as the bucket spec, so
    * each write task holds exactly one bucket's rows → one file.
    */
  private def doWrite(df: DataFrame, table: String, location: Option[String],
                      buckets: Int, keys: Seq[String], sortKeys: Seq[String]): Unit = {
    require(buckets > 0, s"Bucketing: bucket count must be positive, got $buckets")
    require(keys.nonEmpty, "Bucketing: at least one bucket key required")
    keys.foreach(k => require(df.columns.contains(k),
      s"Bucketing: input has no '$k' column"))
    val src =
      if (sortKeys.nonEmpty) df.repartition(buckets, keys.map(df.col): _*) else df
    val w0 = src.write.format("parquet").mode(SaveMode.Overwrite)
    val w = location.fold(w0)(p => w0.option("path", p))
      .bucketBy(buckets, keys.head, keys.tail: _*)
    (if (sortKeys.nonEmpty) w.sortBy(sortKeys.head, sortKeys.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Attach an EXISTING bucketed-table location to a fresh session's catalog
    * WITHOUT rewriting the data: bucket ids live in the part-file names
    * (`part-...._00007....`), so a `CREATE TABLE ... CLUSTERED BY ...
    * LOCATION` over the same files reads with the full bucket (and, for
    * single-file-per-bucket sorted writes, sort) metadata. The caller owns
    * validating the files first ([[graft.SparkEntry]] checks `_SUCCESS` +
    * a source fingerprint) — attaching the wrong files would serve wrong
    * buckets silently. Schema is read from the parquet footers, so the DDL
    * can never drift from the data.
    */
  def registerBucketed(spark: SparkSession, table: String, location: String,
                       buckets: Int, keys: Seq[String],
                       sortKeys: Seq[String] = Nil): Unit = {
    require(!spark.catalog.tableExists(table),
      s"Bucketing.registerBucketed: table '$table' already exists")
    val schemaDdl = spark.read.parquet(location).schema.toDDL
    val sorted =
      if (sortKeys.nonEmpty)
        s" SORTED BY (${sortKeys.map(k => s"`${escapeIdent(k)}`").mkString(", ")})"
      else ""
    val loc = escapeDdlString(location)
    spark.sql(
      s"""CREATE TABLE `${escapeIdent(table)}` ($schemaDdl) USING PARQUET
         |CLUSTERED BY (${keys.map(k => s"`${escapeIdent(k)}`").mkString(", ")})$sorted
         |INTO $buckets BUCKETS
         |LOCATION '$loc'""".stripMargin)
    ()
  }

  /** String-literal escape for values interpolated into DDL: backslashes
    * doubled FIRST, then single quotes (ADVICE r20 + r21 review — a path
    * containing ' broke the statement; without the backslash pass a
    * trailing \ would escape the closing quote and mid-path \t/\n byte
    * pairs would decode as control chars). Note paths containing
    * backslashes still fail UPSTREAM of any DDL (Hadoop's glob expander
    * rejects them in `spark.read.parquet`) — this escape just guarantees
    * the DDL layer never corrupts or breaks on its own.
    */
  private[operators] def escapeDdlString(s: String): String =
    s.replace("\\", "\\\\").replace("'", "\\'")

  /** Backtick-quoted-identifier escape (backticks doubled) — table and
    * column names are interpolated into the same DDL as the location and
    * need their own escape class (r21 review: a backtick in a name would
    * terminate the quoted identifier early).
    */
  private[operators] def escapeIdent(s: String): String =
    s.replace("`", "``")

  /** Make Overwrite mean overwrite ACROSS processes: drop the table if the
    * session knows it, then delete its orphaned warehouse location if one
    * survives from a previous JVM — a fresh session's in-memory catalog has
    * never heard of the table, so its saveAsTable is a CREATE, and CREATE
    * refuses a leftover managed location (LOCATION_ALREADY_EXISTS). Shared
    * by every index writer; harmless no-op when nothing exists.
    */
  def clearTable(spark: SparkSession, table: String): Unit = {
    // Simple unqualified names only: the orphan-location fallback below
    // reconstructs <warehouse>/<lowercased name>, which is only the managed
    // location for a default-database simple name — a qualified name (or a
    // non-default current database) would delete the wrong path.
    require(!table.contains("."),
      s"Bucketing.clearTable: qualified table names are not supported, got '$table'")
    // When the catalog knows the table, use ITS location — authoritative even
    // under a non-default warehouse layout.
    val knownLoc: Option[java.net.URI] =
      if (spark.catalog.tableExists(table))
        scala.util.Try(spark.sessionState.catalog
          .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
          .location).toOption
      else None
    spark.sql(s"DROP TABLE IF EXISTS `${escapeIdent(table)}`")
    val loc = knownLoc.map(u => new org.apache.hadoop.fs.Path(u)).getOrElse(
      new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"),
        table.toLowerCase(java.util.Locale.ROOT)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** The bucketed relation, with Spark's bucketing-aware scan (reading via
    * `spark.table` is what carries the bucket metadata into planning —
    * re-reading the parquet files by path would discard it).
    */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Append to an existing bucketed table. `buckets`/`keys` must match the
    * table's spec — Spark validates bucketing compatibility on append, so a
    * drifted layout fails loudly instead of silently mis-bucketing rows.
    * The one append recipe shared by every daily-ingest index
    * ([[appendBandIndex]], `Winnow.appendFpIndex`).
    */
  def appendBucketed(df: DataFrame, table: String, buckets: Int,
                     keys: Seq[String]): Unit = {
    require(buckets > 0, s"Bucketing: bucket count must be positive, got $buckets")
    require(keys.nonEmpty, "Bucketing: at least one bucket key required")
    keys.foreach(k => require(df.columns.contains(k),
      s"Bucketing: input has no '$k' column"))
    df.write.format("parquet").bucketBy(buckets, keys.head, keys.tail: _*)
      .mode(SaveMode.Append).saveAsTable(table)
  }

  /** Append the day's surviving batch to an existing band index (same
    * exploded `(id, sh, band, bhash)` shape as [[writeBandIndex]]) — the
    * write half of the daily-ingest loop: probe → [[Dedup.minhashIncremental]]
    * → append survivors → tomorrow probes yesterday's docs too. `buckets`
    * must match the existing table's spec: Spark validates bucketing
    * compatibility on append, so a drifted layout fails loudly instead of
    * silently mis-bucketing rows.
    */
  def appendBandIndex(minhashed: DataFrame, table: String, buckets: Int): Unit =
    appendBucketed(explodeBands(minhashed), table, buckets, Seq("band", "bhash"))

  private def explodeBands(minhashed: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    minhashed.select(
      col("doc_id").as("id"),
      col("shingle_hashes").as("sh"),
      posexplode(col("band_hashes")).as(Seq("band", "bhash")))
  }

  /** Materialize a MinHash band index ([[Dedup.minhashed]] output, verbatim)
    * bucketed by `(band, bhash)` — the probe keys of
    * [[Dedup.minhashIncremental]]'s candidate join. Band hashes are exploded
    * at WRITE time so daily probes join the stored layout directly: the
    * corpus side of every subsequent incremental dedup does zero shuffle
    * work, only the new batch redistributes (to `buckets` partitions).
    * Stores `(id, sh, band, bhash)` — the shingle-hash set rides along so
    * the Jaccard verify leg also reads from the same table (column-pruned
    * to `(id, sh)`, id-restricted to candidates).
    */
  def writeBandIndex(minhashed: DataFrame, table: String, buckets: Int): Unit =
    writeBucketed(explodeBands(minhashed), table, buckets, Seq("band", "bhash"))
}
