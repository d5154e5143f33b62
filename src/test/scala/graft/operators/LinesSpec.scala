package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinesSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, lines: String*): (Long, String) = (id, lines.mkString("\n"))

  test("dedupLines keeps the first occurrence globally, reassembles in order") {
    val df = Seq(
      doc(1L, "alpha", "boiler", "beta"),
      doc(2L, "boiler", "gamma"),
      doc(3L, "gamma", "boiler", "alpha", "delta")
    ).toDF("doc_id", "text")
    val out = Lines.dedupLines(df).orderBy("doc_id")
      .select("doc_id", "text", "n_lines_kept", "n_lines_dropped")
      .as[(Long, String, Long, Long)].collect()
    assert(out(0) == ((1L, "alpha\nboiler\nbeta", 3L, 0L)))
    assert(out(1) == ((2L, "gamma", 1L, 1L)))
    assert(out(2) == ((3L, "delta", 1L, 3L)))
  }

  test("dedupLines: first occurrence within one document wins over later ordinals") {
    val df = Seq(doc(5L, "x", "y", "x", "x")).toDF("doc_id", "text")
    val out = Lines.dedupLines(df)
      .select("text", "n_lines_kept", "n_lines_dropped")
      .as[(String, Long, Long)].head()
    assert(out == (("x\ny", 2L, 2L)))
  }

  test("dedupLines: doc losing every line comes back empty, not NULL; NULL text stays NULL") {
    val df = Seq(
      (1L, Some("same")),
      (2L, Some("same")),
      (3L, None: Option[String])
    ).toDF("doc_id", "text")
    val out = Lines.dedupLines(df).orderBy("doc_id")
      .select("doc_id", "text", "n_lines_kept", "n_lines_dropped")
      .as[(Long, Option[String], Long, Long)].collect()
    assert(out(0) == ((1L, Some("same"), 1L, 0L)))
    assert(out(1) == ((2L, Some(""), 0L, 1L)))
    assert(out(2) == ((3L, None, 0L, 0L)))
  }

  test("dedupLines: empty-string lines dedup like any other line") {
    val df = Seq(doc(1L, "a", "", "b"), doc(2L, "", "c")).toDF("doc_id", "text")
    val out = Lines.dedupLines(df).orderBy("doc_id")
      .select("text", "n_lines_dropped").as[(String, Long)].collect()
    assert(out(0) == (("a\n\nb", 0L)))
    assert(out(1) == (("c", 1L)))
  }

  test("dedupLines preserves non-text columns and is deterministic under repartition") {
    val df = Seq((1L, "k\nv", "en"), (2L, "k\nw", "fr")).toDF("doc_id", "text", "lang")
    val out = Lines.dedupLines(df.repartition(7)).orderBy("doc_id")
      .select("lang", "text").as[(String, String)].collect()
    assert(out.toSeq == Seq(("en", "k\nv"), ("fr", "w")))
  }

  test("filterLines keeps predicate-true lines only; NULL predicate drops") {
    val df = Seq(
      doc(1L, "keep data here", "drop me", "more data"),
      (2L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = Lines.filterLines(df, l => l.contains("data")).orderBy("doc_id")
      .select("text", "n_lines_kept", "n_lines_dropped")
      .as[(Option[String], Long, Long)].collect()
    assert(out(0) == ((Some("keep data here\nmore data"), 2L, 1L)))
    assert(out(1) == ((None, 0L, 0L)))
  }

  test("filterLines with always-false predicate empties the doc but keeps the row") {
    val df = Seq(doc(9L, "a", "b")).toDF("doc_id", "text")
    val out = Lines.filterLines(df, _ => lit(false))
      .select("text", "n_lines_kept", "n_lines_dropped")
      .as[(String, Long, Long)].head()
    assert(out == (("", 0L, 2L)))
  }

  test("custom separator is honored (quote-escaped, not a regex)") {
    val df = Seq((1L, "a.b|c.d|a.b")).toDF("doc_id", "text")
    val out = Lines.dedupLines(df, sep = "|").select("text").as[String].head()
    assert(out == "a.b|c.d")
  }

  test("column-collision and missing-column guards") {
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Lines.dedupLines(df.withColumn("n_lines_kept", lit(1)))
    }
    intercept[IllegalArgumentException] {
      Lines.filterLines(df, _ => lit(true), textCol = "nope")
    }
  }
}
