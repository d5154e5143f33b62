package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale document pipelines.
  *
  * Everything here is built from `org.apache.spark.sql.functions` (codegen'd,
  * whole-stage-compatible) — no UDFs. Each function takes and returns
  * `Column`s so they compose into any plan and stay visible to Catalyst.
  */
object TextFunctions {

  /** Whitespace tokenization (the reference data is space-separated words;
    * for general text swap the pattern).
    *
    * Trims ALL whitespace (Spark's `trim` strips spaces only — a trailing tab
    * or newline would leave a trailing empty token and diverge from the
    * native expressions' Java `trim` semantics).
    */
  def tokens(text: Column): Column =
    split(regexp_replace(text, "^\\s+|\\s+$", ""), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Mean token length = chars-without-spaces / tokens. */
  def avgTokenLen(text: Column): Column =
    round(length(regexp_replace(trim(text), "\\s+", "")).cast("double") / tokenCount(text), 4)

  /** BPE-ish pre-tokenization: lowercase runs, Capitalized runs, single
    * digits, single symbols — the GPT-2-style regex shape that approximates
    * subword token counts without a vocabulary. Shared Java/RE2 semantics so
    * the DuckDB oracle matches exactly.
    */
  val bpeishPattern = "[a-z]+|[A-Z][a-z]*|[0-9]|[^a-zA-Z0-9\\s]"

  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text, lit(bpeishPattern), lit(0))

  def bpeishTokenCount(text: Column): Column = size(bpeishTokens(text))

  /** Default stopword list used by quality scoring and language ID. */
  val defaultStopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it")

  def stopwordRatio(text: Column, stopwords: Seq[String] = defaultStopwords): Column = {
    val toks = tokens(text)
    round(size(filter(toks, t => t.isin(stopwords: _*))).cast("double") / size(toks), 4)
  }

  /** Composite quality score in [0,1]: half stopword density (capped), half
    * length saturation at 100 tokens — the cheap hygiene heuristics a pretraining
    * pipeline applies before expensive scoring.
    */
  def qualityScore(text: Column): Column = {
    val toks  = tokens(text)
    val nTok  = size(toks).cast("double")
    val stopR = size(filter(toks, t => t.isin(defaultStopwords: _*))).cast("double") / nTok
    round(least(stopR * 5.0, lit(1.0)) * 0.5 + least(nTok / 100.0, lit(1.0)) * 0.5, 4)
  }

  /** N-gram-profile language ID heuristic: scores each candidate language by
    * marker-token hits and returns the argmax (ties → first in list). Marker
    * lists are deliberately tiny — this is the shape of a fasttext-style LID
    * stage with the model swapped for a fixture; the plan (scan → per-row
    * scoring → argmax, no shuffle) is the part that must hold at 100 TB.
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is", "to"),
    "de" -> Seq("der", "die", "und", "das", "nicht"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "los", "las", "una", "es"),
    "zh" -> Seq("的", "是", "在", "了", "和")
  )

  def langId(text: Column): Column = {
    val langs = langMarkers.toSeq.sortBy(_._1)
    // ONE pass over the tokens: per token a 5-element hit vector, summed into
    // an array accumulator (five separate filter() passes cost 5 interpreted
    // HOF traversals — same lesson as the MinHash rewrite).
    val counts = aggregate(
      tokens(text),
      array_repeat(lit(0), langs.size),
      (acc, t) => zip_with(acc,
        array(langs.map { case (_, markers) =>
          when(t.isin(markers: _*), 1).otherwise(0)
        }: _*),
        (a, b) => a + b))
    val scored = zip_with(counts, typedLit(langs.map(_._1)),
      (score, lang) => struct(score.as("score"), lang.as("lang")))
    // max score, ties broken by lang desc — deterministic either way. No
    // marker hits at all → "und".
    val best = array_max(scored)
    when(best.getField("score") === 0, lit("und")).otherwise(best.getField("lang"))
  }

  /** Order-sensitive ~62-bit document fingerprint: two independent polynomial
    * rolling hashes over the token-hash stream (Horner steps mod the Mersenne
    * prime 2^31-1 — all arithmetic < 2^62, safe under ANSI overflow checking),
    * packed into one long. Distinguishes permuted token orders, unlike
    * bag-of-words hashes; one linear pass, codegen'd.
    */
  def fingerprint(text: Column): Column = {
    val P = graft.functions.HashFunctions.P
    val hashes = transform(tokens(text), t => pmod(xxhash64(t), lit(P)))
    def lane(mult: Long, init: Long): Column =
      aggregate(hashes, lit(init), (acc, h) => pmod(acc * lit(mult) + h, lit(P)))
    lane(31L, 17L) * lit(P) + lane(131L, 29L)
  }
}
