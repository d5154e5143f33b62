package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExactSubstrSpec extends SparkSpec {
  import spark.implicits._

  // 1/2 share an exact 12-token run mid-document; 3 is clean; 4/5 share a
  // 6-token run only (below minTokens=10 — must NOT be reported). The short
  // run uses vocabulary disjoint from everything else so its coverage can't
  // merge with any other repeat's.
  private val sharedRun = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
  private val shortRun = "red orange yellow green blue violet"
  private val docs = Seq(
    (1L, s"one two three $sharedRun four five six"),
    (2L, s"seven eight $sharedRun nine ten eleven twelve"),
    (3L, "totally unique words nothing repeated here at all whatsoever"),
    (4L, s"begin four $shortRun end four"),
    (5L, s"start five $shortRun finish five")
  ).toDF("doc_id", "text")

  test("repeated spans cover exactly the shared run, short repeats suppressed") {
    val spans = ExactSubstr.repeatedSpans(docs, k = 5, minTokens = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted
    // doc 1: run starts at token 3 (0-based), 12 tokens -> [3, 14]
    // doc 2: run starts at token 2 -> [2, 13]
    // docs 3/4/5: nothing (the 6-token shared run -> 2 shared 5-grams ->
    // a 6-token covered span < 10)
    assert(spans.toSeq == Seq((1L, 3, 14), (2L, 2, 13)))
  }

  test("removalStats: exact token accounting, zeros for clean docs") {
    val got = ExactSubstr.removalStats(docs, k = 5, minTokens = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).sorted
    assert(got.toSeq == Seq(
      (1L, 18, 1L, 12L), (2L, 18, 1L, 12L), (3L, 9, 0L, 0L),
      (4L, 10, 0L, 0L), (5L, 10, 0L, 0L)))
  }

  test("removeRepeated cuts the span and keeps surrounding text; full-dup docs drop") {
    val cleaned = ExactSubstr.removeRepeated(docs, k = 5, minTokens = 10)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cleaned(1L) == "one two three four five six")
    assert(cleaned(2L) == "seven eight nine ten eleven twelve")
    assert(cleaned(3L).startsWith("totally unique"))
    assert(cleaned(4L) == s"begin four $shortRun end four") // sub-threshold: untouched
    // a corpus of two identical docs: both flagged end-to-end, both drop
    val twins = Seq((1L, sharedRun), (2L, sharedRun)).toDF("doc_id", "text")
    assert(ExactSubstr.removeRepeated(twins, k = 5, minTokens = 10).count() == 0)
  }

  test("a repeat WITHIN one document is found too (the paper's any-occurrence rule)") {
    val selfRep = Seq((1L, s"$sharedRun filler words between the copies $sharedRun"))
      .toDF("doc_id", "text")
    val spans = ExactSubstr.repeatedSpans(selfRep, k = 5, minTokens = 10)
      .collect().map(r => (r.getInt(1), r.getInt(2))).sorted
    assert(spans.length == 2 && spans(0) == (0, 11) && spans(1) == (17, 28))
  }

  test("docs shorter than k emit nothing; null text is skipped") {
    val tiny = Seq((1L, "only three tokens"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    assert(ExactSubstr.repeatedSpans(tiny, k = 5, minTokens = 10).count() == 0)
    val stats = ExactSubstr.removalStats(tiny, k = 5, minTokens = 10).collect()
    assert(stats.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("removalStats n_tokens: native TokStats count matches the split form on degenerate texts (r21)") {
    // r21 swapped the interpreted split/filter token count for the native
    // TokStats pass; the rlike guard must keep the empty/whitespace-only
    // rows at 0 (TokStats alone reports the [""]-artifact 1 there).
    val edge = Seq((1L, ""), (2L, " \t\n "), (3L, "a"), (4L, "  a  b  "))
      .toDF("doc_id", "text")
    val got = ExactSubstr.removalStats(edge, k = 5, minTokens = 10)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got == Seq((1L, 0), (2L, 0), (3L, 1), (4L, 2)), s"got $got")
  }

  test("guards: k/minTokens relation, missing columns") {
    intercept[IllegalArgumentException](ExactSubstr.repeatedSpans(docs, k = 0))
    intercept[IllegalArgumentException](ExactSubstr.repeatedSpans(docs, k = 10, minTokens = 5))
    intercept[IllegalArgumentException](ExactSubstr.repeatedSpans(docs.drop("text")))
  }

  test("null-text docs pass through removeRepeated unchanged (never silently dropped)") {
    val mixed = Seq((1L, sharedRun), (2L, sharedRun), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = ExactSubstr.removeRepeated(mixed, k = 5, minTokens = 10)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    // docs 1/2 are full dups of each other → both drop; the null-text doc
    // carries no spans and must survive with text still NULL
    assert(out == Map(3L -> None))
  }

  test("wideHash (64-bit production hash) finds the same spans on collision-free data") {
    // On data with no 48-bit collisions the two hash widths must agree
    // exactly — the wide hash only exists to shrink the birthday-collision
    // rate at corpus scales the sandbox can't reach (see scaladoc).
    def spanSet(wide: Boolean) =
      ExactSubstr.repeatedSpans(docs, k = 5, minTokens = 10, wideHash = wide)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(spanSet(wide = true) == spanSet(wide = false))
    def cleanedSet(wide: Boolean) =
      ExactSubstr.removeRepeated(docs, k = 5, minTokens = 10, wideHash = wide)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(cleanedSet(wide = true) == cleanedSet(wide = false))
    // and the widened values really use more than 48 bits of space: the
    // 64-bit head of md5("a b c d e") differs from the 48-bit head shifted
    val one = Seq(("x")).toDF("t")
      .select(graft.plans.TextExpressions.kgramHashes(col("t"), 1, bits = 48).as("h48"),
        graft.plans.TextExpressions.kgramHashes(col("t"), 1, bits = 64).as("h64"))
      .head()
    val h48 = one.getSeq[Long](0).head; val h64 = one.getSeq[Long](1).head
    assert((h64 >>> 16) == h48 && h64 != h48)
  }

  test("wideHashFor: the bit-width policy reproduces the documented collision arithmetic") {
    // the scaladoc's anchors: 10^13 gram positions at 48 bits is ~10^11
    // expected false spans (unacceptable), at 64 bits ~10^2
    val at48 = ExactSubstr.expectedFalseSpans(1e13, bits = 48)
    val at64 = ExactSubstr.expectedFalseSpans(1e13, bits = 64)
    assert(at48 > 1e10 && at48 < 1e13, s"48-bit estimate off: $at48")
    assert(at64 > 10 && at64 < 1e4, s"64-bit estimate off: $at64")
    // policy: sf-scale corpora keep the DuckDB-recomputable 48-bit default…
    assert(!ExactSubstr.wideHashFor(1e9.toLong))       // ~sf100 text volume
    assert(!ExactSubstr.wideHashFor(60000L))           // harness scale
    // …and production corpora flip to the 64-bit head
    assert(ExactSubstr.wideHashFor(1e10.toLong))
    assert(ExactSubstr.wideHashFor(1e13.toLong))
    // the crossover sits where one false span is expected: ~1.5e9 grams
    assert(!ExactSubstr.wideHashFor(1400000000L) && ExactSubstr.wideHashFor(1600000000L))
    // a caller with a tighter tolerance flips earlier
    assert(ExactSubstr.wideHashFor(1e9.toLong, tolerableFalseSpans = 0.01))
  }

  test("plan: bodies never ride the dup-detection exchanges (narrow rows only)") {
    val plan = ExactSubstr.repeatedSpans(docs, k = 5, minTokens = 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
    // the hash-count aggregate must project to h before its exchange: no
    // `text` column in any Exchange input
    val exchangeBlocks = plan.split("Exchange").drop(1)
    assert(exchangeBlocks.forall(b => !b.take(200).contains("text#")), plan)
  }
}
