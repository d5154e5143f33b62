package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def doc(text: String) = Seq((1L, text)).toDF("id", "text")

  private def chunks(text: String, window: Int, stride: Int): Seq[(Int, String, Int)] =
    Chunking.tokenWindows(doc(text), "id", "text", window, stride)
      .orderBy("chunk_id")
      .select("chunk_id", "chunk_text", "n_chunk_tokens")
      .as[(Int, String, Int)].collect().toSeq

  test("overlapping windows with a partial tail") {
    // 10 tokens, window 4, stride 3 → starts 0,3,6,9
    val got = chunks("a b c d e f g h i j", window = 4, stride = 3)
    assert(got == Seq(
      (0, "a b c d", 4),
      (1, "d e f g", 4),
      (2, "g h i j", 4),
      (3, "j", 1)))
  }

  test("stride = window partitions exactly") {
    val got = chunks("a b c d e f", window = 3, stride = 3)
    assert(got == Seq((0, "a b c", 3), (1, "d e f", 3)))
  }

  test("stride > window samples with gaps") {
    val got = chunks("a b c d e f g", window = 2, stride = 5)
    assert(got == Seq((0, "a b", 2), (1, "f g", 2)))
  }

  test("input columns pass through alongside the chunk columns") {
    val out = Chunking.tokenWindows(
      Seq((1L, "a b c d", "en")).toDF("id", "text", "lang"), "id", "text", 2, 2)
    assert(out.columns.toSeq == Seq("id", "text", "lang", "chunk_id", "chunk_text", "n_chunk_tokens"))
    assert(out.select("lang").distinct().as[String].collect().toSeq == Seq("en"))
  }

  test("short doc yields one partial chunk; NULL text yields no rows") {
    assert(chunks("only two", window = 8, stride = 4) == Seq((0, "only two", 2)))
    val n = Chunking.tokenWindows(
      spark.sql("SELECT 1L AS id, cast(null as string) AS text"),
      "id", "text", 8, 4).count()
    assert(n == 0L)
  }

  test("output column collisions rejected; invalid params rejected") {
    intercept[IllegalArgumentException](
      Chunking.tokenWindows(doc("a").withColumn("chunk_id", lit(1)), "id", "text", 8, 4))
    intercept[IllegalArgumentException](Chunking.tokenWindows(doc("a"), "id", "text", 0, 4))
    intercept[IllegalArgumentException](Chunking.tokenWindows(doc("a"), "id", "text", 8, 0))
  }

  test("helper-column collisions rejected with a clear message") {
    import spark.implicits._
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Chunking.tokenWindows(df.withColumn("__graft_toks", lit(1)),
        idCol = "doc_id", textCol = "text", window = 2, stride = 2)
    }
  }
}
