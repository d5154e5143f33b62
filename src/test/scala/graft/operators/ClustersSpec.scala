package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ClustersSpec extends SparkSpec {
  import spark.implicits._

  private def nodes(ids: Long*) = ids.toDF("id")
  private def edges(pairs: (Long, Long)*) = pairs.toDF("src", "dst")

  // localEdgeThreshold = 0 pins the DISTRIBUTED loop: these tests assert
  // loop contracts (rounds, maxIter, mid-loop NULL handling). Fast-path
  // coverage + loop parity is at the bottom of the suite.
  private def run(n: org.apache.spark.sql.DataFrame, e: org.apache.spark.sql.DataFrame,
                  maxIter: Int = 30): Map[Long, Long] =
    Clusters.connectedComponents(n, e, maxIter = maxIter, localEdgeThreshold = 0)
      .as[(Long, Long)].collect().toMap

  test("chain is transitively one component labeled by its minimum") {
    val comp = run(nodes(1, 2, 3, 4, 9), edges(2L -> 1L, 2L -> 3L, 3L -> 4L))
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 9L -> 9L))
  }

  test("disjoint components keep separate minima; isolated nodes are singletons") {
    val comp = run(nodes(1, 2, 3, 10, 11, 20), edges(1L -> 2L, 2L -> 3L, 10L -> 11L))
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("edge orientation and duplicate edges are irrelevant") {
    val comp = run(nodes(1, 2, 3), edges(3L -> 2L, 2L -> 3L, 2L -> 1L, 2L -> 1L))
    assert(comp.values.toSet == Set(1L))
  }

  test("endpoints missing from the nodes frame are added automatically") {
    val comp = run(nodes(5), edges(5L -> 7L, 7L -> 6L))
    assert(comp == Map(5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("cycles converge (no infinite propagation)") {
    val comp = run(nodes(1, 2, 3, 4), edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L))
    assert(comp.values.toSet == Set(1L))
  }

  test("insufficient maxIter throws instead of returning a split clustering") {
    // a 6-node chain rooted at the far end needs >1 round to pull the label across
    val chain = edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 6L)
    intercept[IllegalStateException](run(nodes(1, 2, 3, 4, 5, 6), chain, maxIter = 1))
    // and with enough rounds the same graph is one component
    assert(run(nodes(1, 2, 3, 4, 5, 6), chain).values.toSet == Set(1L))
  }

  test("invalid maxIter rejected") {
    intercept[IllegalArgumentException](run(nodes(1), edges(), maxIter = 0))
  }

  test("NULL node ids are excluded up front, not dropped mid-loop — both paths") {
    // review regression: without the entry filter a NULL id survived into
    // labels and the inner jump join silently dropped it in round 1
    val n = Seq(Some(1L), None, Some(2L)).toDF("id")
    for (t <- Seq(0, 200000)) {
      val comp = Clusters.connectedComponents(n, edges(1L -> 2L), localEdgeThreshold = t)
        .as[(Long, Long)].collect().toMap
      assert(comp == Map(1L -> 1L, 2L -> 1L), s"threshold=$t")
    }
  }

  test("NULL edge endpoints are ignored, never re-injected as phantom nodes — both paths") {
    import spark.implicits._
    // Review regression: an edge like (1, NULL) used to survive the label
    // join on its non-NULL side and emit a phantom (NULL, component) row.
    // The half-NULL edges' live endpoints must still register even when
    // absent from `nodes` (here: 4 via (4, NULL)) — on BOTH paths.
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq((Some(1L), Some(2L)), (Some(1L), None), (None, Some(3L)),
        (Some(4L), None))
      .toDF("src", "dst")
    for (t <- Seq(0, 200000)) {
      val out = Clusters.connectedComponents(nodes, edges, localEdgeThreshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      assert(out == Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 4L)), s"threshold=$t")
    }
  }

  // ---- small-graph fast path (driver union-find + broadcast join-back) ----

  test("fast path ≡ distributed loop on a mixed graph (chain, cycle, isolated, missing endpoints)") {
    val n = nodes(1, 2, 3, 4, 9, 20)
    val e = edges(2L -> 1L, 2L -> 3L, 3L -> 4L, 5L -> 6L, 6L -> 7L, 7L -> 5L, 8L -> 30L)
    val fast = Clusters.connectedComponents(n, e).as[(Long, Long)].collect().toMap
    val loop = run(n, e)
    assert(fast == loop)
    assert(fast == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 9L -> 9L, 20L -> 20L,
      5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 8L, 30L -> 8L))
  }

  test("fast path runs ZERO fixpoint rounds: maxIter=1 on a long chain still converges") {
    // the same chain whose loop-path contract is "throws at maxIter=1"
    val chain = edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 6L)
    val comp = Clusters.connectedComponents(nodes(1, 2, 3, 4, 5, 6), chain, maxIter = 1)
      .as[(Long, Long)].collect().toMap
    assert(comp.values.toSet == Set(1L))
  }

  test("probe overflow falls back to the loop (threshold below edge count)") {
    val e = edges(1L -> 2L, 2L -> 3L, 10L -> 11L)
    val comp = Clusters.connectedComponents(nodes(1, 2, 3, 10, 11), e,
        localEdgeThreshold = 2)
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("fast path handles non-numeric ids (string minimum representative)") {
    val n = Seq("delta", "alpha", "omega").toDF("id")
    val e = Seq(("delta", "beta"), ("beta", "alpha")).toDF("src", "dst")
    val comp = Clusters.connectedComponents(n, e)
      .as[(String, String)].collect().toMap
    assert(comp == Map("alpha" -> "alpha", "beta" -> "alpha", "delta" -> "alpha",
      "omega" -> "omega"))
  }

  test("invalid localEdgeThreshold rejected") {
    intercept[IllegalArgumentException](
      Clusters.connectedComponents(nodes(1), edges(), localEdgeThreshold = -1))
  }

  test("non-BMP string ids: fast-path representative matches Spark's binary min (≡ loop)") {
    // U+1F600 is a surrogate pair in UTF-16 (0xD83D 0xDE00), which
    // String.compareTo sorts BELOW U+FFFD; Spark's binary UTF-8 ordering
    // (= code point order) sorts it ABOVE. The fast path must agree with
    // the loop — i.e. pick the U+FFFD id as the component minimum.
    val astral = "id-😀"
    val bmp = "id-�"
    val n = Seq(astral, bmp).toDF("id")
    val e = Seq((astral, bmp)).toDF("src", "dst")
    val fast = Clusters.connectedComponents(n, e).as[(String, String)].collect().toMap
    val loop = Clusters.connectedComponents(n, e, localEdgeThreshold = 0)
      .as[(String, String)].collect().toMap
    assert(fast == loop)
    assert(fast.values.toSet == Set(bmp))
  }

  test("binary ids fall through to the distributed loop (not fast-path Comparable) and resolve") {
    // Array[Byte] is neither Comparable nor a value-equal HashMap key, so
    // the type gate must route BinaryType ids to the loop even under the
    // default-on threshold — previously a ClassCastException.
    val e = Seq((Array[Byte](2), Array[Byte](1)), (Array[Byte](2), Array[Byte](3)))
      .toDF("src", "dst")
    val n = Seq(Array[Byte](1), Array[Byte](9)).toDF("id")
    val out = Clusters.connectedComponents(n, e)
      .collect()
      .map(r => (r.getAs[Array[Byte]](0).toSeq, r.getAs[Array[Byte]](1).toSeq))
      .toMap
    assert(out == Map(
      Seq[Byte](1) -> Seq[Byte](1), Seq[Byte](2) -> Seq[Byte](1),
      Seq[Byte](3) -> Seq[Byte](1), Seq[Byte](9) -> Seq[Byte](9)))
  }

  test("randomized parity: fast path ≡ loop on a seeded 300-edge graph (self-loops included)") {
    val rnd = new scala.util.Random(13)
    val e = Seq.fill(300)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong)).toDF("src", "dst")
    val n = (0L until 90L).toDF("id")
    val fast = Clusters.connectedComponents(n, e).as[(Long, Long)].collect().toMap
    val loop = Clusters.connectedComponents(n, e, localEdgeThreshold = 0)
      .as[(Long, Long)].collect().toMap
    assert(fast == loop)
    assert(fast.size == 90)
  }
}
