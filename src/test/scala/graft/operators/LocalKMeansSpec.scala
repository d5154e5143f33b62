package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class LocalKMeansSpec extends AnyFunSuite {

  private def gauss(rnd: java.util.Random, center: Array[Double], spread: Double) =
    center.map(_ + rnd.nextGaussian() * spread)

  test("recovers well-separated clusters; deterministic for a seed") {
    val rnd = new java.util.Random(42)
    val trueCenters = Array(Array(0.0, 0.0), Array(10.0, 0.0), Array(0.0, 10.0))
    val points = Array.tabulate(600)(i => gauss(rnd, trueCenters(i % 3), 0.1))
    val got = LocalKMeans.fit(points, 3, seed = 7L)
    assert(got.length == 3)
    // every true center has a fitted center within 0.2
    trueCenters.foreach { t =>
      val best = got.map(c => math.sqrt(c.zip(t).map { case (a, b) => (a - b) * (a - b) }.sum)).min
      assert(best < 0.2, s"no fitted center near ${t.toSeq}: ${got.map(_.toSeq).toSeq}")
    }
    val again = LocalKMeans.fit(points, 3, seed = 7L)
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq, "not deterministic")
  }

  test("k larger than distinct points still yields k centers") {
    val points = Array(Array(1.0, 1.0), Array(1.0, 1.0), Array(2.0, 2.0))
    val got = LocalKMeans.fit(points, 5, seed = 1L)
    assert(got.length == 5)
    // every center is a valid point-space location (one of the inputs or a mean)
    got.foreach(c => assert(c.length == 2))
  }

  test("guards: empty input, bad k, ragged dims, NaN coordinates") {
    intercept[IllegalArgumentException] { LocalKMeans.fit(Array.empty, 3, 1L) }
    intercept[IllegalArgumentException] { LocalKMeans.fit(Array(Array(1.0)), 0, 1L) }
    intercept[IllegalArgumentException] {
      LocalKMeans.fit(Array(Array(1.0), Array(1.0, 2.0)), 1, 1L)
    }
    // NaN poisons every restart's cost — must fail loudly, not return null
    val e = intercept[IllegalArgumentException] {
      LocalKMeans.fit(Array(Array(1.0, Double.NaN), Array(2.0, 3.0)), 1, 1L)
    }
    assert(e.getMessage.contains("NaN"))
  }

  test("fit assignment equals NearestCenter scan assignment (tie policy shared)") {
    val rnd = new java.util.Random(3)
    val points = Array.tabulate(200)(_ => Array(rnd.nextDouble(), rnd.nextDouble(), rnd.nextDouble()))
    val centers = LocalKMeans.fit(points, 4, seed = 11L)
    // the scan-side argmin (lower index wins ties) must agree with a direct
    // local argmin over the same centers
    points.foreach { p =>
      val dists = centers.map(c => p.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum)
      val local = dists.indexOf(dists.min)
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(p)
      val scan = graft.plans.NearestCenter.compute(arr, centers, aF = false)
      assert(scan == local)
    }
  }
}
