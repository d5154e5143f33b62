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
      // cost eval is an n·k·dim pass PER RESTART — with the serial fold it
      // (plus seeding) dominated fit wall time once Lloyd went parallel
      val cost = parSum(points.length)(i =>
        sqDist(points(i), centers(nearest(points(i), centers))))
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
      // the D² update is the other n·k·dim serial pass — parallel per-point
      // updates (index-disjoint) + fixed-chunk ordered partial sums, so the
      // result is deterministic for a given version regardless of thread
      // count (chunk size and merge order are fixed; the chunked float sum
      // differs from the old serial fold only in last-bit rounding)
      val sum = parSum(points.length) { i =>
        val d = sqDist(points(i), centers(c - 1))
        if (d < d2(i)) d2(i) = d
        d2(i)
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
      // mean accumulation: per-chunk local (sums, counts) merged in chunk
      // order — the measured remaining serial cost per iteration (~0.14 s of
      // the 0.15 s at 100k×64×50) once assignment went parallel. Chunking is
      // fixed, so the result is thread-count-independent (the chunked float
      // sum differs from a serial fold only in last-bit rounding).
      val chunk = 4096
      val nChunks = (points.length + chunk - 1) / chunk
      val chunkSums = new Array[Array[Array[Double]]](nChunks)
      val chunkCounts = new Array[Array[Long]](nChunks)
      java.util.stream.IntStream.range(0, nChunks).parallel().forEach { ci =>
        val ls = Array.ofDim[Double](k, dim)
        val lc = new Array[Long](k)
        var i = ci * chunk
        val hi = math.min(i + chunk, points.length)
        while (i < hi) {
          val a = assign(i)
          val p = points(i)
          val s = ls(a)
          var j = 0
          while (j < dim) { s(j) += p(j); j += 1 }
          lc(a) += 1
          i += 1
        }
        chunkSums(ci) = ls
        chunkCounts(ci) = lc
      }
      val sums = Array.ofDim[Double](k, dim)
      val counts = new Array[Long](k)
      var ci = 0
      while (ci < nChunks) {
        var a = 0
        while (a < k) {
          val s = sums(a); val ls = chunkSums(ci)(a)
          var j = 0
          while (j < dim) { s(j) += ls(j); j += 1 }
          counts(a) += chunkCounts(ci)(a)
          a += 1
        }
        ci += 1
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

  /** Parallel sum of `f(i)` over `0 until n`: fixed 4096-wide chunks summed
    * serially inside and merged in chunk order — deterministic for any
    * thread count. `f` may carry index-disjoint side effects (the D²
    * update); chunks partition the index space so they never race.
    */
  private def parSum(n: Int)(f: Int => Double): Double = {
    val chunk = 4096
    val nChunks = (n + chunk - 1) / chunk
    val partial = new Array[Double](nChunks)
    java.util.stream.IntStream.range(0, nChunks).parallel().forEach { ci =>
      var i = ci * chunk
      val hi = math.min(i + chunk, n)
      var s = 0.0
      while (i < hi) { s += f(i); i += 1 }
      partial(ci) = s
    }
    var t = 0.0
    var c = 0
    while (c < nChunks) { t += partial(c); c += 1 }
    t
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
