package graft.operators

/** Driver-local Lloyd's k-means with k-means++ seeding — the coarse-quantizer
  * trainer behind [[Similarity.ivfIndex]].
  *
  * Why local and not MLlib: the quantizer fits on a BOUNDED sample
  * (`maxFitSample` rows, independent of corpus size), and a distributed fit
  * over a bounded sample is all overhead — k-means|| seeding plus ten Lloyd
  * iterations cost ~15 driver-orchestrated Spark jobs whose launches dwarf
  * the arithmetic (measured 2.1 s WARM at sf1 for a 6k-row sample whose
  * local fit is ~10 ms). This is the standard IVF training shape (FAISS
  * trains its coarse quantizer the same way: sample → local fit →
  * distributed assignment); the corpus-side work stays fully distributed as
  * one codegen'd [[graft.plans.NearestCenter]] assignment scan. Driver
  * memory is the sample: maxFitSample × dim × 8 B (51 MB at the 100k
  * default for 64-dim; lower `maxFitSample` for very wide embeddings).
  *
  * Deterministic for a given (points, k, seed): seeding uses a seeded
  * `java.util.Random`, the assignment step is pure per-point (parallelized
  * over a deterministic partition), and ties break toward the lower center
  * index everywhere — matching NearestCenter, so a fit point's training
  * assignment equals its scan assignment.
  */
object LocalKMeans {

  /** `k` centers (exactly `k` even when fewer distinct points exist —
    * duplicate centers are harmless for a coarse quantizer and keep
    * `nlist`-sized probe math simple). Empty clusters keep their previous
    * center. Best of `restarts` independent seedings by total
    * within-cluster squared distance (FAISS's `nredo` — a single
    * k-means++ shot can land a poor local minimum that costs probe
    * recall; restarts on a bounded sample are driver-cheap).
    */
  def fit(points: Array[Array[Double]], k: Int, seed: Long,
          maxIter: Int = 10, tol: Double = 1e-4, restarts: Int = 3): Array[Array[Double]] = {
    require(restarts > 0, s"LocalKMeans: restarts=$restarts must be positive")
    var best: Array[Array[Double]] = null
    var bestCost = Double.PositiveInfinity
    var r = 0
    while (r < restarts) {
      val centers = fitOnce(points, k, seed + r, maxIter, tol)
      val cost = points.foldLeft(0.0)((acc, p) => acc + sqDist(p, centers(nearest(p, centers))))
      if (cost < bestCost) { bestCost = cost; best = centers }
      r += 1
    }
    // NaN cost in EVERY restart (NaN/Inf coordinates poison sqDist) would
    // otherwise fall through as null and NPE far from the bad row
    require(best != null,
      "LocalKMeans: fit cost was NaN for every restart — the sample contains NaN/Inf coordinates")
    best
  }

  private def fitOnce(points: Array[Array[Double]], k: Int, seed: Long,
                      maxIter: Int, tol: Double): Array[Array[Double]] = {
    require(k > 0, s"LocalKMeans: k=$k must be positive")
    require(points.nonEmpty, "LocalKMeans: no points to fit")
    val dim = points(0).length
    require(points.forall(_.length == dim),
      "LocalKMeans: fit points must share one dimensionality")
    val rnd = new java.util.Random(seed)

    // k-means++ (Arthur/Vassilvitskii 2007): D² sampling. O(n·k·dim).
    val centers = new Array[Array[Double]](k)
    centers(0) = points(rnd.nextInt(points.length)).clone()
    val d2 = Array.fill(points.length)(Double.PositiveInfinity)
    var c = 1
    while (c < k) {
      var i = 0
      var sum = 0.0
      while (i < points.length) {
        val d = sqDist(points(i), centers(c - 1))
        if (d < d2(i)) d2(i) = d
        sum += d2(i)
        i += 1
      }
      centers(c) =
        if (sum == 0.0) points(rnd.nextInt(points.length)).clone() // all points covered
        else {
          var r = rnd.nextDouble() * sum
          var j = 0
          while (j < points.length - 1 && r >= d2(j)) { r -= d2(j); j += 1 }
          points(j).clone()
        }
      c += 1
    }

    // Lloyd iterations: parallel pure assignment, serial mean accumulation
    // (assignment is the n·k·dim term; the mean pass is n·dim).
    val assign = new Array[Int](points.length)
    var iter = 0
    var moved = Double.PositiveInfinity
    while (iter < maxIter && moved > tol) {
      java.util.stream.IntStream.range(0, points.length).parallel().forEach { i =>
        assign(i) = nearest(points(i), centers)
      }
      val sums = Array.ofDim[Double](k, dim)
      val counts = new Array[Long](k)
      var i = 0
      while (i < points.length) {
        val a = assign(i)
        val p = points(i)
        val s = sums(a)
        var j = 0
        while (j < dim) { s(j) += p(j); j += 1 }
        counts(a) += 1
        i += 1
      }
      moved = 0.0
      c = 0
      while (c < k) {
        if (counts(c) > 0) {
          val m = new Array[Double](dim)
          var j = 0
          while (j < dim) { m(j) = sums(c)(j) / counts(c); j += 1 }
          moved = math.max(moved, math.sqrt(sqDist(m, centers(c))))
          centers(c) = m
        } // empty cluster: keep the previous center
        c += 1
      }
      iter += 1
    }
    centers
  }

  private def nearest(p: Array[Double], centers: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < centers.length) {
      val d = sqDist(p, centers(c))
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
    acc
  }
}
