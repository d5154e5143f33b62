package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKAggregateSpec extends SparkSpec {
  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("q").orderBy(desc("score"), col("id"))
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .select("q", "id", "score")
  }

  private def aggTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("q")
      .agg(TopKAggregate.topK(col("score"), col("id"), k).as("__tk"))
      .select(col("q"), explode(col("__tk")).as("__e"))
      .select(col("q"), col("__e.id").as("id"), col("__e.score").as("score"))

  test("matches the window formulation on ties, NaN, nulls, -0.0, short groups") {
    val rows = Seq(
      // q=1: plain values with a tie at 0.5 (ids 3,4) straddling the k edge
      (1L, 1L, Some(0.9)), (1L, 2L, Some(0.7)), (1L, 3L, Some(0.5)),
      (1L, 4L, Some(0.5)), (1L, 5L, Some(0.1)),
      // q=2: NaN must rank FIRST (Spark sorts NaN greatest), null LAST
      (2L, 1L, Some(Double.NaN)), (2L, 2L, Some(1.0)), (2L, 3L, None),
      (2L, 4L, Some(0.2)),
      // q=3: -0.0 vs 0.0 must tie → id decides
      (3L, 7L, Some(0.0)), (3L, 6L, Some(-0.0)), (3L, 8L, Some(-1.0)),
      // q=4: fewer rows than k
      (4L, 1L, Some(0.3)),
      // q=5: only nulls
      (5L, 2L, None), (5L, 1L, None)
    ).toDF("q", "id", "score")
    // compare scores by BITS: Some(NaN) == Some(NaN) is false under ==, and
    // the agg must preserve the exact stored value (incl. the sign of -0.0)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(d => java.lang.Double.doubleToLongBits(d.asInstanceOf[Double])))
    for (k <- Seq(1, 2, 3, 10)) {
      val expected = windowTopK(rows, k).collect().map(key).toSet
      val got = aggTopK(rows, k).collect().map(key).toSet
      assert(got == expected, s"k=$k: agg=$got window=$expected")
    }
  }

  test("result array is rank-ordered; explode preserves it") {
    val rows = (0L until 100L).map(i => (1L, i, math.sin(i.toDouble))).toDF("q", "id", "score")
    val arr = rows.groupBy("q")
      .agg(TopKAggregate.topK(col("score"), col("id"), 7).as("tk"))
      .select(posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("pos"), col("e.score").as("s"))
      .orderBy("pos")
      .collect().map(r => (r.getInt(0), r.getDouble(1)))
    assert(arr.map(_._2).toSeq == arr.map(_._2).sorted(Ordering[Double].reverse).toSeq,
      s"not rank ordered: ${arr.mkString(",")}")
    assert(arr.length == 7)
  }

  test("partial/merge path agrees with single-partition path") {
    val rows = (0L until 5000L).map(i => (i % 13, i, ((i * 2654435761L) % 1000L).toDouble))
      .toDF("q", "id", "score")
    val one = aggTopK(rows.coalesce(1), 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val many = aggTopK(rows.repartition(17), 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(one == many)
  }

  test("integer id columns implicit-cast up (the window formulation accepted them)") {
    val rows = Seq((1L, 7, 0.9), (1L, 8, 0.5), (1L, 9, 0.7)).toDF("q", "id", "score")
    val got = aggTopK(rows, 2).collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((7L, 0.9), (9L, 0.7)))
  }

  test("null id raises; k guard fires") {
    val bad = Seq((1L, Option.empty[Long], 0.5)).toDF("q", "id", "score")
    val e = intercept[Exception] {
      bad.groupBy("q").agg(TopKAggregate.topK(col("score"), col("id"), 3)).collect()
    }
    assert(e.getMessage != null)
    import org.apache.spark.sql.graftshim.ColumnShim
    intercept[IllegalArgumentException] {
      TopKByScore(ColumnShim.expression(lit(1.0)), ColumnShim.expression(lit(1L)), 0)
    }
  }

  test("non-integral id fails at ANALYSIS, not with a null mid-job") {
    // A string id would implicit-cast to LongType and eval to null at
    // runtime — the documented contract is integral-only, enforced by
    // checkInputDataTypes before any job launches.
    val rows = Seq((1L, "a", 0.9), (1L, "b", 0.5)).toDF("q", "id", "score")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      rows.groupBy("q").agg(TopKAggregate.topK(col("score"), col("id"), 2)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("integral"), e.getMessage)
    // double ids are equally rejected (silent truncation is not ranking)
    val dbl = Seq((1L, 1.5, 0.9)).toDF("q", "id", "score")
    intercept[org.apache.spark.sql.AnalysisException] {
      dbl.groupBy("q").agg(TopKAggregate.topK(col("score"), col("id"), 2)).collect()
    }
    // scale-0 decimals (BIGINT via JDBC/parquet) convert losslessly — accepted
    val dec = Seq((1L, BigDecimal(7), 0.9), (1L, BigDecimal(8), 0.5))
      .toDF("q", "id", "score")
      .withColumn("id", col("id").cast("decimal(10,0)"))
    val got = aggTopK(dec, 1).collect().map(_.getLong(1)).toSeq
    assert(got == Seq(7L))
    // fractional decimals are not exact integers — rejected
    intercept[org.apache.spark.sql.AnalysisException] {
      dec.withColumn("id", col("id").cast("decimal(10,2)"))
        .groupBy("q").agg(TopKAggregate.topK(col("score"), col("id"), 2)).collect()
    }
  }
}
