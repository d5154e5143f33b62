package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** RELY constraint registry feeding the RI-aware optimizer rules
  * ([[RiRules]]): declared-but-unvalidated uniqueness and foreign-key facts
  * about base tables, keyed by scan identity (the parquet root paths).
  *
  * This is the same contract as Oracle/Snowflake `RELY` constraints: the
  * engine TRUSTS the declaration and uses it to rewrite plans (top-N
  * pushdown through FK joins, FK join elimination); a declaration the data
  * violates yields wrong results, exactly as RELY does. graft derives these
  * declarations from the catalog's relation config
  * ([[graft.Tables.catalog]] — the reference's `relations` map, reference
  * src/SourceConfigResolver.ts:22-31, already asserts this shape: a
  * `belongsTo` whose parent slug is the unique key IS an FK declaration),
  * and library users can register their own via [[register]].
  *
  * Scale note: the registry is driver-side metadata (a few entries per
  * table), consulted only during optimization — nothing here touches
  * executors or data paths.
  */
object Constraints {

  /** Declared (RELY) foreign key on a child table: every row of the child
    * whose `childCol` is non-null has EXACTLY ONE matching row in the parent
    * scan identified by `parentTag` on `parentCol` (referential totality;
    * uniqueness of the parent side is declared separately via
    * [[TableConstraints.uniqueCols]]).
    */
  final case class Fk(childCol: String, parentTag: String, parentCol: String)

  /** Per-table declarations: columns that are unique + non-null
    * (single-column keys only), and outgoing foreign keys. */
  final case class TableConstraints(uniqueCols: Set[String], fks: Seq[Fk]) {
    def merge(other: TableConstraints): TableConstraints =
      TableConstraints(uniqueCols ++ other.uniqueCols,
        (fks ++ other.fks).distinct)
  }

  private val registry =
    scala.collection.concurrent.TrieMap.empty[String, TableConstraints]

  /** Scan identity of a plan subtree that IS a single v1 file scan: the
    * sorted root paths. None for anything else (multi-scan plans, in-memory
    * frames, v2 sources) — callers must treat None as "no constraints".
    */
  def scanTag(plan: LogicalPlan): Option[String] = plan match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation =>
        Some(fs.location.rootPaths.map(_.toString).sorted.mkString(","))
      case _ => None
    }
    case _ => None
  }

  /** Scan identity of a DataFrame whose plan contains exactly one file scan
    * (possibly under projections/filters). None if zero or several scans —
    * a frame built from joins has no single identity to hang constraints on.
    */
  def tagOf(df: DataFrame): Option[String] = {
    val scans = df.queryExecution.analyzed.collect {
      case lr: LogicalRelation => lr }
    scans match {
      case Seq(one) => scanTag(one)
      case _        => None
    }
  }

  def register(tag: String, c: TableConstraints): Unit =
    registry.updateWith(tag) {
      case Some(prev) => Some(prev.merge(c))
      case None       => Some(c)
    }

  def get(tag: String): Option[TableConstraints] = registry.get(tag)

  def forPlan(plan: LogicalPlan): Option[TableConstraints] =
    scanTag(plan).flatMap(registry.get)

  /** Test hook — constraints are global (keyed by file paths, which are
    * globally meaningful), so specs that plant conflicting declarations
    * reset between cases. */
  def clear(): Unit = registry.clear()
}
