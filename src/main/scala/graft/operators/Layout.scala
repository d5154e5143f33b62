package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Data-layout control for scan-time pruning — the storage companion to
  * [[Bucketing]] (which co-locates JOINS; this prunes SCANS).
  *
  * Parquet keeps min/max statistics per row group ("zone maps"): a filter
  * pushed to the scan skips every row group whose range can't match. That
  * only bites when the data is CLUSTERED on the filter column — a random
  * layout gives every row group the full min..max span and nothing skips.
  * `writeSorted` materializes exactly that clustering:
  * `repartitionByRange` (one range shuffle, contiguous non-overlapping
  * spans per file) + `sortWithinPartitions` (contiguous spans per row group
  * INSIDE each file) — so a point or range predicate touches the few row
  * groups it overlaps instead of the whole table. At 100 TB this is the
  * difference between reading ~everything and reading ~selectivity.
  *
  * The effect is pinned in LayoutSpec by the scan's own numOutputRows
  * metric: the same filter over the same rows emits a fraction of the rows
  * from the sorted layout vs the shuffled one (row groups that min/max-miss
  * never reach the reader).
  */
object Layout {

  /** Write `df` range-clustered on `sortCols`. `rowGroupBytes` caps the
    * parquet block size — smaller groups = finer pruning granularity at
    * slightly more footer overhead (default 128 MB is right for 100 TB
    * tables; tests use tiny groups to get many groups from little data).
    */
  def writeSorted(df: DataFrame, path: String, sortCols: Seq[String],
                  rowGroupBytes: Option[Long] = None): Unit = {
    require(sortCols.nonEmpty, "Layout.writeSorted: at least one sort column required")
    sortCols.foreach(c => require(df.columns.contains(c),
      s"Layout.writeSorted: input has no '$c' column"))
    import org.apache.spark.sql.functions.col
    val cols = sortCols.map(col)
    val w = df.repartitionByRange(cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode(SaveMode.Overwrite)
    rowGroupBytes.fold(w)(b => w.option("parquet.block.size", b.toString))
      .parquet(path)
  }
}
