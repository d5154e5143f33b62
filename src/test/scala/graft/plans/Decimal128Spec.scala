package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bit-parity of the native 128-bit fixed-point SUM against the decimal
  * plan it replaces: every assertion compares java.lang.Double.compare on
  * the raw bits (no tolerance) — the aggregate's contract is "the same
  * double `sum(cast(x as decimal(18,s))).cast(double)` produces".
  */
class Decimal128Spec extends SparkSpec {
  import spark.implicits._

  private def bitEqual(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (x: Double, y: Double) => java.lang.Double.compare(x, y) == 0
    case _ => false
  }

  /** Money-like and adversarial doubles: exact cents, shortest-repr
    * rounding traps (0.145 prints as "0.145" but sits below it), negatives,
    * tiny magnitudes, values wider than the fast path's 2^40 bound.
    */
  private def pool(seed: Long, n: Int): Seq[java.lang.Double] = {
    val r = new scala.util.Random(seed)
    val traps = Seq[java.lang.Double](
      0.145, -0.145, 1.005, 2.675, 0.125, -0.125, 1e-300, -1e-300, 0.0, -0.0,
      12345678901.23, -9876543210.99, 3.3333333333, 123456789012345.6, null)
    (0 until n).map { i =>
      if (i < traps.size) traps(i)
      else if (r.nextInt(10) == 0) null
      else if (r.nextInt(4) == 0) java.lang.Double.valueOf(r.nextDouble() * 2000 - 1000)
      else java.lang.Double.valueOf((r.nextInt(2000000) - 1000000) / 100.0)
    }
  }

  test("two-level sumMoneyPartial/sumMoneyMerge is bit-equal to one-level sumMoney (r21)") {
    // The q_corpus_card pre-group shape: sum per fine group, merge per
    // coarse group. 128-bit adds are associative and the double conversion
    // happens once at the end, so the merged value must match one-level
    // sumMoney on the raw bits — a plain sum of the per-group doubles
    // would not (re-rounds per add; this pin is why the helpers exist).
    val rows = pool(77, 4000).zipWithIndex
      .map { case (v, i) => (i % 7, i % 131, v) } // coarse key, fine key
    val df = rows.toDF("g", "f", "x")
    for (scale <- Seq(2, 6)) {
      val one = df.groupBy("g")
        .agg(Decimal128.sumMoney(col("x"), scale).as("s"))
        .collect().map(r => r.getInt(0) -> r.get(1)).toMap
      val two = df.groupBy("g", "f")
        .agg(Decimal128.sumMoneyPartial(col("x"), scale).as("p"))
        .groupBy("g")
        .agg(Decimal128.sumMoneyMerge(col("p"), scale).as("s"))
        .collect().map(r => r.getInt(0) -> r.get(1)).toMap
      one.foreach { case (g, v) =>
        assert(bitEqual(v, two(g)), s"scale=$scale g=$g one-level=$v two-level=${two(g)}")
      }
    }
  }

  test("toScaledLong is bit-equal to cast(double as decimal(18,s)) per row") {
    for (scale <- Seq(2, 4, 6)) {
      // The session runs ANSI (Spark 4 default): the reference cast THROWS
      // on >18-digit overflow where toScaledLong nulls (the documented
      // non-ANSI divergence, pinned in the next test) — compare in-range.
      val inRange = pool(42 + scale, 4000)
        .filter(v => v == null || math.abs(v) < 9e17 / math.pow(10, scale))
      val df = inRange.toDF("v").repartition(4)
      val rows = df.select(
        col("v").cast(s"decimal(18,$scale)").as("dec"),
        Decimal128.scaled(col("v"), scale).as("scl")).collect()
      rows.foreach { r =>
        val dec = if (r.isNullAt(0)) null
          else r.getDecimal(0).unscaledValue.longValue
        val scl = if (r.isNullAt(1)) null else r.getLong(1)
        assert(dec == scl, s"scale=$scale dec=$dec scl=$scl")
      }
    }
  }

  test("grouped sum128 parity incl. merge path (partial agg across partitions)") {
    val r = new scala.util.Random(7)
    val df = pool(7, 6000).map(v => (r.nextInt(13), v)).toDF("g", "v")
      .repartition(8) // forces a real partial/merge split per group
    val got = df.groupBy("g")
      .agg(Decimal128.sumMoney(col("v")).as("s"),
           sum(col("v").cast("decimal(18,2)")).cast("double").as("ref"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { row =>
      assert(bitEqual(row.get(1), row.get(2)), s"group ${row.get(0)}: ${row.get(1)} vs ${row.get(2)}")
    }
  }

  test("all-null group and empty-frame global agg evaluate to null") {
    val df = Seq[(Int, java.lang.Double)]((1, null), (1, null)).toDF("g", "v")
    val r1 = df.groupBy("g").agg(Decimal128.sumMoney(col("v")).as("s")).collect()
    assert(r1.length == 1 && r1(0).isNullAt(1))
    val r2 = df.filter(col("g") === 99)
      .agg(Decimal128.sumMoney(col("v")).as("s")).collect()
    assert(r2.length == 1 && r2(0).isNullAt(0))
  }

  test("NaN and Infinity convert to null (non-ANSI cast results)") {
    val df = Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity, 1.25)
      .toDF("v")
    val rows = df.select(Decimal128.scaled(col("v"), 2)).collect()
    assert(rows.map(r => if (r.isNullAt(0)) null else r.getLong(0)).toSeq
      == Seq(null, null, null, 125L))
  }

  test("18-digit cast overflow nulls (non-ANSI cast result; ANSI cast throws)") {
    val big = 1e17 // scale 2 -> 19 unscaled digits: overflow
    val rows = Seq(big, 1.0).toDF("v")
      .select(Decimal128.scaled(col("v"), 2)).collect()
    assert(rows(0).isNullAt(0) && rows(1).getLong(0) == 100L)
  }

  test("disc_price product form parity (decimal(18,2) x decimal(18,4) summed at scale 6)") {
    val r = new scala.util.Random(11)
    val df = (0 until 3000).map { _ =>
      (r.nextInt(5),
       (r.nextInt(10000000) + 100) / 100.0,      // price
       r.nextInt(11) / 100.0)                     // discount 0.00-0.10
    }.toDF("g", "price", "disc").repartition(6)
    val got = df.groupBy("g").agg(
      Decimal128.sum128(
        Decimal128.mul(
          Decimal128.scaled(col("price"), 2),
          lit(10000L) - Decimal128.scaled(col("disc"), 4)), 6).as("s"),
      sum(col("price").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,4)") - col("disc").cast("decimal(18,4)")))
        .cast("double").as("ref")).collect()
    got.foreach { row =>
      assert(bitEqual(row.get(1), row.get(2)), s"group ${row.get(0)}: ${row.get(1)} vs ${row.get(2)}")
    }
  }

  test("128-bit carry: partials beyond one long's range merge correctly") {
    // 40 values of 9e17 = 3.6e19 > Long.MaxValue (9.2e18): the lo word
    // must wrap and the carry land in hi for the sum to come out right.
    val df = Seq.fill(40)(9.0e15).toDF("v").repartition(8)
    val got = df.agg(Decimal128.sumMoney(col("v")).as("s")).collect()(0).getDouble(0)
    assert(got == 40 * 9.0e15, s"got $got")
    // and a negative mirror crossing zero from below
    val df2 = (Seq.fill(40)(-9.0e15) ++ Seq.fill(39)(9.0e15)).toDF("v").repartition(8)
    val got2 = df2.agg(Decimal128.sumMoney(col("v")).as("s")).collect()(0).getDouble(0)
    assert(got2 == -9.0e15, s"got $got2")
  }

  test("sum128 runs inside HashAggregateExec (primitive buffer, codegen)") {
    val df = pool(3, 100).toDF("v")
      .groupBy(lit(1)).agg(Decimal128.sumMoney(col("v")))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("ObjectHashAggregate"), plan)
  }
}
