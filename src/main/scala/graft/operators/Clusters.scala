package graft.operators

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Duplicate-cluster resolution: connected components over a near-duplicate
  * pair graph (e.g. [[Dedup.minhashLsh]]'s verified pairs). Where the greedy
  * corpus policies ([[Dedup.minhashCorpus]]) drop any doc matching a
  * lower-id doc, full components give TRANSITIVE clusters — a~b, b~c puts
  * a,b,c in one cluster even when a and c never paired — which is what you
  * need for "keep exactly one representative per duplicate family" and for
  * auditing how duplication concentrates.
  *
  * Algorithm: min-label propagation (Pregel-style) accelerated with pointer
  * jumping. Every node starts labeled with its own id; each round, every
  * node takes the minimum label among itself and its neighbors
  * (edge-label equi-join + min aggregate over (id, label) widths — document
  * bodies are never in the frame), then labels compress through
  * comp ← comp(comp) (a labels-with-labels equi-join): the distance a
  * minimum has travelled DOUBLES per round, so convergence needs
  * O(log diameter) rounds instead of O(diameter) — the property that makes
  * the loop viable for adversarially chain-shaped graphs at scale, and the
  * same recurrence large-star/small-star is built on. Labels are always
  * existing node ids (minima of node ids), so the jump join is total.
  *
  * Lineage discipline (load-bearing): `labels` feeds THREE places per round
  * (the union, the edge join, both jump-join sides), so without truncation
  * the logical plan QUADRUPLES every round — planning cost goes exponential
  * long before data size matters (measured: 3.7 s round-0 → 5.4 s round-2
  * on a 100-node graph). Each round therefore ends in an eager
  * `localCheckpoint`, which materializes the (id, comp) frame and replaces
  * its plan with the checkpointed RDD — constant-size plans at every round,
  * the same reason GraphFrames checkpoints its CC loop. localCheckpoint
  * blocks are executor-local (lost if an executor dies mid-loop — the loop
  * then fails and is re-run); swap in `checkpoint` against a reliable dir
  * for long multi-hour jobs. Old rounds' blocks are reclaimed by
  * ContextCleaner as their RDDs go out of scope.
  *
  * EAGER: the fixpoint loop is driver-coordinated, so the call runs jobs
  * (one convergence probe per round) and returns a checkpointed result
  * frame. Throws IllegalStateException if `maxIter` rounds don't converge —
  * a truncated clustering is silently WRONG (it splits components), never
  * returned.
  *
  * ADAPTIVE SMALL-GRAPH FAST PATH: the loop's cost at the low end is pure
  * JOB floor — ~3 jobs x O(log diameter) rounds — which dwarfs the actual
  * union-find work whenever the edge list is small (a verified near-dup
  * pair graph usually is: dup *pairs* are rare even when the corpus is
  * huge). So the call first probes the edge list with ONE bounded job:
  * `limit(localEdgeThreshold + 1).collect()` — a CollectLimit, which never
  * collects more than threshold+1 rows to the driver. How much WORK the
  * probe does depends on the edge plan: over a scan-shaped frame
  * CollectLimit executes partitions incrementally and stops early; when the
  * edges come out of joins/aggregates (the usual near-dup case),
  * producing the first output partition already runs the upstream shuffle
  * stages, so a fall-through has paid one evaluation of the edge pipeline.
  * The edge frame is therefore persisted (MEMORY_AND_DISK) before the
  * probe: whatever the probe computed is reused by the loop instead of
  * recomputed, making the fall-through's extra cost the bounded collect
  * itself, not a second pipeline evaluation. If the raw edge rows fit the
  * threshold, components are resolved driver-side (union-find, path
  * compression) and the result is a LAZY plan: one distinct over node ids
  * (required by the one-row-per-id contract — the loop pays the same
  * exchange) plus one BROADCAST join against the bounded
  * endpoint→component mapping. Per-row driver memory is two id values, so
  * the default threshold (200k edges) is a few MB. The representative is
  * the component's minimum id under the same ordering Spark's `min` uses —
  * strings compare by code point (= binary UTF-8 order, including astral
  * planes), other atomics via their JVM `Comparable`. The fast path is
  * gated to id types where that equivalence holds (numeric, decimal,
  * default-collation string, date/timestamp, boolean); binary, nested, and
  * collated-string ids always take the distributed loop. `maxIter` (a loop
  * contract) is not consulted on the fast path. Set
  * `localEdgeThreshold = 0` to force the distributed loop.
  */
object Clusters {

  /** Ascending order matching Spark's `min` for every fast-path id type.
    * Strings compare by CODE POINT (== unsigned UTF-8 byte order, Spark's
    * binary string ordering) — `String.compareTo` is UTF-16 code-unit order,
    * which sorts non-BMP characters (surrogate range 0xD800+) BELOW
    * U+E000..U+FFFF and would pick a different component representative
    * than the loop for astral-plane ids. Everything else goes through JVM
    * `Comparable`, identical to Spark's ordering for the whitelisted types
    * (numerics incl. NaN-greatest doubles, decimal, date/timestamp both
    * java.sql and java.time, boolean).
    */
  private val anyAsc: Ordering[Any] = new Ordering[Any] {
    def compare(a: Any, b: Any): Int = (a, b) match {
      case (x: String, y: String) => codePointCompare(x, y)
      case _ => a.asInstanceOf[Comparable[Any]].compareTo(b)
    }
  }

  private def codePointCompare(x: String, y: String): Int = {
    var i = 0
    var j = 0
    while (i < x.length && j < y.length) {
      val cx = x.codePointAt(i)
      val cy = y.codePointAt(j)
      if (cx != cy) return Integer.compare(cx, cy)
      i += Character.charCount(cx)
      j += Character.charCount(cy)
    }
    Integer.compare(x.length - i, y.length - j)
  }

  /** Id types the driver-side fast path accepts: atomic types whose EXTERNAL
    * (Row.get) representation is a `Comparable` ordering-compatible with
    * Spark's `min` AND whose equality/hashCode make valid HashMap keys.
    * BinaryType fails both (Array[Byte] is reference-equal and not
    * Comparable), arrays/structs aren't Comparable, and non-default string
    * collations order differently than the binary comparison [[anyAsc]]
    * does — all of those fall through to the distributed loop, which orders
    * via Spark's own expressions and is correct for every orderable type.
    */
  private def fastPathComparable(t: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    t match {
      case _: NumericType => true // incl. DecimalType -> java.math.BigDecimal
      case DateType | TimestampType | TimestampNTZType | BooleanType => true
      case s: StringType => s == StringType // default (binary) collation only
      case _ => false
    }
  }

  /** Driver-side union-find over a bounded undirected edge list: every
    * NON-NULL endpoint id → minimum id of its component. Duplicate /
    * reversed edges are harmless (union is idempotent); a NULL endpoint is
    * "no neighbor" — the non-NULL side is still registered (it may be an
    * isolated node the `nodes` frame doesn't carry), matching the loop's
    * label-initialization semantics.
    */
  private def localComponents(edgeList: Array[(Any, Any)]): mutable.HashMap[Any, Any] = {
    val index = mutable.HashMap.empty[Any, Int]
    val ids = mutable.ArrayBuffer.empty[Any]
    val parent = mutable.ArrayBuffer.empty[Int]
    def idx(v: Any): Int = index.getOrElseUpdate(v, { ids += v; parent += ids.length - 1; ids.length - 1 })
    def find(i: Int): Int = {
      var r = i
      while (parent(r) != r) r = parent(r)
      var c = i
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edgeList.foreach { case (s, d) =>
      if (s != null && d != null) {
        val (rs, rd) = (find(idx(s)), find(idx(d)))
        if (rs != rd) parent(rd) = rs
      } else if (s != null) idx(s)
      else if (d != null) idx(d)
    }
    val minOfRoot = mutable.HashMap.empty[Int, Any]
    ids.indices.foreach { i =>
      val r = find(i)
      val v = ids(i)
      minOfRoot.get(r) match {
        case Some(m) if anyAsc.lteq(m, v) => ()
        case _ => minOfRoot(r) = v
      }
    }
    val out = mutable.HashMap.empty[Any, Any]
    ids.indices.foreach(i => out(ids(i)) = minOfRoot(find(i)))
    out
  }

  /** Connected components of the graph over `nodes` ∪ edge endpoints.
    *
    * NULL ids are EXCLUDED from the graph up front (a NULL never joins
    * through an edge anyway, and leaving it in would let the inner jump
    * join drop it silently mid-loop). The output therefore contains one row
    * per DISTINCT NON-NULL id.
    *
    * @param nodes one-column frame of node ids (isolated nodes keep their
    *              own id as component; endpoints missing from `nodes` are
    *              added automatically)
    * @param edges undirected pair frame; orientation and duplicates don't
    *              matter (symmetrized + de-duplicated internally)
    * @param localEdgeThreshold raw edge rows at or below which components
    *              resolve driver-side (see class doc); 0 forces the loop
    * @return (`idCol`, component) — component = min node id in the component
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
                          idCol: String = "id",
                          srcCol: String = "src", dstCol: String = "dst",
                          maxIter: Int = 30,
                          localEdgeThreshold: Int = 200000): DataFrame = {
    require(maxIter > 0, s"Clusters: maxIter must be positive, got $maxIter")
    require(localEdgeThreshold >= 0,
      s"Clusters: localEdgeThreshold must be >= 0, got $localEdgeThreshold")
    val raw = edges.select(col(srcCol).as("s"), col(dstCol).as("d"))

    // Small-graph probe: one CollectLimit job, bounded at threshold+1 rows.
    // Probes the UNFILTERED edge frame so half-NULL edges still register
    // their live endpoint (same as the loop's label init). Gated on the
    // type whitelist (see fastPathComparable) and on a single endpoint id
    // type for the mapping frame; mixed src/dst types (never the case in
    // graft's callers) just fall through to the loop, whose union performs
    // the normal coercion. The frame is persisted BEFORE the probe so a
    // fall-through's loop reuses the partitions the probe computed instead
    // of re-running the upstream edge pipeline (see the class doc).
    val sTpe = raw.schema.head.dataType
    val tryFast = localEdgeThreshold > 0 && sTpe == raw.schema(1).dataType &&
      fastPathComparable(sTpe)
    val rawEdges = if (tryFast) raw.persist(StorageLevel.MEMORY_AND_DISK) else raw
    // Everything below runs under try/finally: a throw anywhere between the
    // persist and the return (probe collect, driver union-find, a loop
    // round) must not leak the cached edge frame (or sym) for the session
    // lifetime. Unpersist of an already-unpersisted frame is a no-op, so
    // the happy paths pay nothing for the cleanup being in finally.
    var symCached: DataFrame = null
    try {
    if (tryFast) {
      val probe = rawEdges.limit(localEdgeThreshold + 1).collect()
      if (probe.length <= localEdgeThreshold) {
        val comp = localComponents(probe.map(r => (r.get(0), r.get(1))))
        val spark = nodes.sparkSession
        val mapping = spark.createDataFrame(
          comp.iterator.map { case (id, c) => Row(id, c) }.toSeq.asJava,
          StructType(Seq(StructField("id", sTpe), StructField("__graft_comp", sTpe))))
        val allIds = nodes.select(col(idCol).as("id")).filter(col("id").isNotNull)
          .unionByName(mapping.select("id"))
          .distinct()
        // the returned plan references only `nodes` + the driver-side
        // mapping, so the probe cache can go immediately (finally re-runs
        // the unpersist as a no-op)
        rawEdges.unpersist(blocking = false)
        return allIds.join(broadcast(mapping), Seq("id"), "left")
          .select(col("id").as(idCol),
            coalesce(col("__graft_comp"), col("id")).as("component"))
      }
    }

    // A NULL endpoint is "no neighbor", not a node: without this filter an
    // edge like (1, NULL) survives the label join on its non-NULL side and
    // re-injects a phantom NULL-id row into the output, violating the
    // non-NULL-id contract the initial-label filter establishes.
    val pairs = rawEdges.filter(col("s").isNotNull && col("d").isNotNull)

    val sym = pairs
      .unionByName(pairs.select(col("d").as("s"), col("s").as("d")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    symCached = sym

    // Eager localCheckpoint: materialized (id, comp) with a truncated plan —
    // see the lineage-discipline note above.
    var labels = nodes.select(col(idCol).as("id"))
      .unionByName(rawEdges.select(col("s").as("id")))
      .unionByName(rawEdges.select(col("d").as("id")))
      .filter(col("id").isNotNull) // see the NULL-id contract above
      .distinct()
      .select(col("id"), col("id").as("comp"))
      .localCheckpoint(true)

    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val viaEdges = sym.join(labels, col("s") === col("id"))
        // NULL __graft_prev: min(ignoring nulls) leaves the self row's value,
        // so each output row carries its own previous label for free — the
        // convergence probe below is a filter on the SAME frame, not a
        // second join+shuffle against the previous round.
        .select(col("d").as("id"), col("comp"), lit(null).as("__graft_prev"))
      // The edge-propagation half materializes on its own so the convergence
      // probe can run BEFORE the pointer jump: propagation-stability over
      // symmetric edges already implies every component's labels are equal
      // (comp(id) ≤ comp(nbr) both ways ⇒ equality), so a no-change round is
      // the global fixpoint and the final round's jump join + checkpoint are
      // skipped entirely. Non-final rounds split into two smaller jobs
      // (edge join, then label-width jump join over the checkpointed hop)
      // doing the same total work the fused round did.
      val hopped = labels.select(col("id"), col("comp"), col("comp").as("__graft_prev"))
        .unionByName(viaEdges)
        .groupBy("id").agg(min("comp").as("comp"), min("__graft_prev").as("__graft_prev"))
        .localCheckpoint(true)
      // Labels only decrease, so an unchanged propagation is the fixpoint
      // (min-propagation is monotone); cheap filter over the checkpointed hop.
      converged = hopped.filter(col("comp") =!= col("__graft_prev")).isEmpty
      if (converged) {
        labels = hopped.select("id", "comp")
      } else {
        // Pointer jump: comp ← comp(comp); `hopped` is checkpointed, so
        // feeding both join sides re-reads materialized blocks, not the plan.
        labels = hopped
          .join(hopped.select(col("id").as("__graft_jid"), col("comp").as("__graft_jcomp")),
            col("comp") === col("__graft_jid"))
          .select(col("id"), col("__graft_jcomp").as("comp"))
          .localCheckpoint(true)
      }
      iter += 1
    }
    if (!converged) {
      throw new IllegalStateException(
        s"Clusters.connectedComponents: no fixpoint after $maxIter rounds — " +
        "the graph has a component with a longer shortest-path chain; raise maxIter")
    }
    // `labels` is localCheckpoint-materialized: unpersisting its inputs in
    // finally cannot recompute anything.
    labels.select(col("id").as(idCol), col("comp").as("component"))
    } finally {
      rawEdges.unpersist(blocking = false) // no-op when the probe never persisted
      if (symCached ne null) symCached.unpersist(blocking = false)
    }
  }
}
