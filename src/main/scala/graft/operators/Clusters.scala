package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
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
  */
object Clusters {

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
    * @return (`idCol`, component) — component = min node id in the component
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
                          idCol: String = "id",
                          srcCol: String = "src", dstCol: String = "dst",
                          maxIter: Int = 30): DataFrame = {
    require(maxIter > 0, s"Clusters: maxIter must be positive, got $maxIter")
    val sym = edges.select(col(srcCol).as("s"), col(dstCol).as("d"))
      .unionByName(edges.select(col(dstCol).as("s"), col(srcCol).as("d")))
      // A NULL endpoint is "no neighbor", not a node: without this filter an
      // edge like (1, NULL) survives the label join on its non-NULL side and
      // re-injects a phantom NULL-id row into the output, violating the
      // non-NULL-id contract the initial-label filter establishes.
      .filter(col("s").isNotNull && col("d").isNotNull)
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Eager localCheckpoint: materialized (id, comp) with a truncated plan —
    // see the lineage-discipline note above.
    var labels = nodes.select(col(idCol).as("id"))
      .unionByName(edges.select(col(srcCol).as("id")))
      .unionByName(edges.select(col(dstCol).as("id")))
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
    sym.unpersist(blocking = false)
    if (!converged) {
      throw new IllegalStateException(
        s"Clusters.connectedComponents: no fixpoint after $maxIter rounds — " +
        "the graph has a component with a longer shortest-path chain; raise maxIter")
    }
    labels.select(col("id").as(idCol), col("comp").as("component"))
  }
}
