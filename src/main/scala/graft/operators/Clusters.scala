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
  * Algorithm: min-label propagation (Pregel-style). Every node starts
  * labeled with its own id; each round, every node takes the minimum label
  * among itself and its neighbors; at fixpoint the label IS the component's
  * minimum id. Each round is ONE shuffle (edge-label equi-join + min
  * aggregate) over (id, label) widths — document bodies are never in the
  * frame. Rounds needed = longest shortest-path in any component; near-dup
  * graphs are shallow (duplicate families are dense), so the default
  * `maxIter` covers them with room. For adversarially deep graphs (long
  * chains) the literature swap-in is large-star/small-star pointer doubling
  * (O(log d) rounds, same join shape); not needed for dedup graphs.
  *
  * EAGER: the fixpoint loop is driver-coordinated, so the call runs jobs
  * (one convergence probe per round) and returns a persisted result frame
  * (ContextCleaner reclaims it when the plan is GC'd). Throws
  * IllegalStateException if `maxIter` rounds don't converge — a truncated
  * clustering is silently WRONG (it splits components), never returned.
  */
object Clusters {

  /** Connected components of the graph over `nodes` ∪ edge endpoints.
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
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = nodes.select(col(idCol).as("id"))
      .unionByName(edges.select(col(srcCol).as("id")))
      .unionByName(edges.select(col(dstCol).as("id")))
      .distinct()
      .select(col("id"), col("id").as("comp"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val viaEdges = sym.join(labels, col("s") === col("id"))
        .select(col("d").as("id"), col("comp"))
      val next = labels.unionByName(viaEdges)
        .groupBy("id").agg(min("comp").as("comp"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // One action per round: did any label move? Labels only decrease, so
      // an unchanged round is the fixpoint (min over neighbors is monotone).
      converged = next.join(labels.withColumnRenamed("comp", "__graft_prev"), "id")
        .filter(col("comp") =!= col("__graft_prev"))
        .isEmpty
      labels.unpersist(blocking = false)
      labels = next
      iter += 1
    }
    sym.unpersist(blocking = false)
    if (!converged) {
      labels.unpersist(blocking = false)
      throw new IllegalStateException(
        s"Clusters.connectedComponents: no fixpoint after $maxIter rounds — " +
        "the graph has a component with a longer shortest-path chain; raise maxIter")
    }
    labels.select(col("id").as(idCol), col("comp").as("component"))
  }
}
