package graft.operators

import graft.SparkSpec
import graft.operators.QualityClassifier.{NgramModel, formulaModel, score, scoreColumnar, trainLocal}
import graft.plans.HashedNgramLogit
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "spark sql joins hash aggregate exchange"),
    (3L, "single"),
    (4L, ""),               // degenerate: zero grams, must drop
    (5L, "   "),            // whitespace-only, must drop
    (6L, "a b a b a b"),    // repeated bigrams count per OCCURRENCE
    (7L, "tab\tand\nnewline   separated tokens")
  )
  private lazy val docs = texts.toDF("doc_id", "text")
  private lazy val withNull =
    docs.unionByName(Seq((8L, null.asInstanceOf[String])).toDF("doc_id", "text"))

  test("native score matches the columnar twin exactly (logit is integer-exact)") {
    val m = formulaModel(512)
    val n = score(withNull, m).orderBy("doc_id").collect()
    val c = scoreColumnar(withNull, m).orderBy("doc_id").collect()
    assert(n.length == c.length)
    n.zip(c).foreach { case (a, b) => assert(a == b, s"native $a != columnar $b") }
    // null/empty/whitespace docs dropped on both paths
    assert(n.map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 6L, 7L))
  }

  test("zero-gram drop via the rlike pre-filter matches tokenizer semantics on control chars (r21)") {
    // r21 replaced finish()'s pushed-down `n_grams > 0` (which re-evaluated
    // the full logit in the Filter) with `rlike("\\S")` — equivalent ONLY
    // because the tokenizer's whitespace class is exactly Java-regex \s.
    // Control chars <= U+0020 outside \s (FS, NUL here) are TOKENS: a doc of
    // just "\u001C" must survive with 1 gram on both paths (a Java
    // String.trim-based predicate would wrongly drop it).
    val edge = Seq(
      (10L, "\u001C"),                  // FS: non-\s control char -> one token
      (11L, "\u000B\u000C\r"),          // VT/FF/CR: all \s -> zero tokens, drop
      (12L, "\u0000"),                  // NUL: non-\s -> one token
      (13L, "\u0000 x y \u001D"),       // mixed: 4 tokens
      (14L, "\t \n")                    // \s only -> drop
    ).toDF("doc_id", "text")
    val m = formulaModel(512)
    val n = score(edge, m).orderBy("doc_id").collect()
    val c = scoreColumnar(edge, m).orderBy("doc_id").collect()
    assert(n.toSeq == c.toSeq, s"native ${n.toSeq} != columnar ${c.toSeq}")
    assert(n.map(_.getLong(0)).toSet == Set(10L, 12L, 13L))
    // single-token FS doc: 1 unigram + 0 bigrams
    assert(n.find(_.getLong(0) == 10L).get.getInt(1) == 1)
    assert(n.find(_.getLong(0) == 13L).get.getInt(1) == 4 + 3)
  }

  test("hand-computed logit: gram stream, bucket, weight sum") {
    // doc 6: tokens [a b a b a b] -> 6 unigrams + 5 bigrams = 11 grams
    val m = formulaModel(512)
    def w(g: String): Long = {
      val j = HashedNgramLogit.bucket(g, 512).toLong
      (j * 1103515245L + 12345L) % 2001L - 1000L
    }
    val expected = 3 * w("a") + 3 * w("b") + 3 * w("a b") + 2 * w("b a")
    val row = score(docs, m).filter($"doc_id" === 6L).head()
    assert(row.getInt(row.fieldIndex("n_grams")) == 11)
    assert(row.getLong(row.fieldIndex("logit_milli")) == expected)
    assert(row.getBoolean(row.fieldIndex("label")) == (expected > 0))
    val sc = row.getDouble(row.fieldIndex("score"))
    assert(math.abs(sc - expected / 1000.0 / 11) < 5e-5)
  }

  test("unigram-only model counts no bigrams") {
    val m = formulaModel(512, includeBigrams = false)
    val row = score(docs, m).filter($"doc_id" === 6L).head()
    assert(row.getInt(row.fieldIndex("n_grams")) == 6)
    val c = scoreColumnar(docs, m).filter($"doc_id" === 6L).head()
    assert(row.getLong(row.fieldIndex("logit_milli")) ==
      c.getLong(c.fieldIndex("logit_milli")))
  }

  test("trainLocal learns a planted domain and the distributed scorer applies it") {
    // positive class: database prose; negative: lorem filler. Disjoint
    // vocabularies, so a linear hashed-ngram model must separate them.
    val pos = Seq(
      "query planner pushes filters into the scan",
      "hash join builds on the broadcast side",
      "columnar scan prunes parquet row groups",
      "aggregate pushdown saves a full shuffle",
      "the optimizer reorders joins by cardinality")
    val neg = Seq(
      "lorem ipsum dolor sit amet consectetur",
      "adipiscing elit sed do eiusmod tempor",
      "incididunt ut labore et dolore magna",
      "aliqua enim ad minim veniam quis",
      "nostrud exercitation ullamco laboris nisi")
    val model = trainLocal(pos.map((_, true)) ++ neg.map((_, false)), d = 1024, epochs = 20)
    // training set must be fully separated after convergence
    val train = (pos.zipWithIndex.map { case (t, i) => (i.toLong, t, true) } ++
      neg.zipWithIndex.map { case (t, i) => ((i + 100).toLong, t, false) })
      .toDF("doc_id", "text", "want")
    val got = score(train, model, idCol = "doc_id").join(train, "doc_id")
    assert(got.filter($"label" =!= $"want").count() == 0, "training set must separate")
    // held-out docs built from each domain's vocabulary classify correctly
    val heldOut = Seq(
      (200L, "the planner prunes row groups in the scan", true),
      (201L, "dolor magna veniam tempor lorem", false)).toDF("doc_id", "text", "want")
    val ho = score(heldOut, model).join(heldOut, "doc_id")
    assert(ho.filter($"label" =!= $"want").count() == 0, "held-out docs must classify")
  }

  test("scoring is a pure scan projection: no exchange before the output sort") {
    val plan = score(docs, formulaModel(256)).orderBy("doc_id")
      .queryExecution.executedPlan.toString
    // exactly one exchange: the range partitioning for the final sort
    assert("(?i)exchange".r.findAllIn(plan).size <= 1, plan)
  }

  test("guards: empty model, missing columns, empty samples") {
    intercept[IllegalArgumentException](NgramModel(Array.emptyLongArray))
    intercept[IllegalArgumentException](score(docs.drop("text"), formulaModel(8)))
    intercept[IllegalArgumentException](trainLocal(Seq.empty))
    intercept[IllegalArgumentException](formulaModel(0))
  }
}
