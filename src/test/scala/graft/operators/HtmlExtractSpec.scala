package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.plans.HtmlTextExtract.HtmlRules

class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def runBoth(pages: Seq[(Long, String)], rules: HtmlRules = HtmlRules()) = {
    val df = pages.toDF("doc_id", "html")
    val fast = HtmlExtract.extract(df, rules)
      .orderBy("doc_id").select("doc_id", "html", "n_blocks", "n_kept")
      .as[(Long, String, Long, Long)].collect().toSeq
    val twin = df.select(col("doc_id"),
        HtmlExtract.extractColumns(col("html"), rules).as("s"))
      .select(col("doc_id"), col("s.text").as("html"),
        col("s.n_blocks"), col("s.n_kept"))
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(fast == twin, s"native ≠ column twin (rules=$rules)")
    fast
  }

  test("content paragraph survives; nav/footer links, script, style, comment do not") {
    val page = """<html><head><title>T</title><style>p{color:red}</style></head><body>""" +
      """<nav><a href="/">Home</a> <a href="/a">About us page</a></nav>""" +
      """<p>This paragraph has plenty of real content words to pass every gate.</p>""" +
      """<script>var x = "<p>not a block</p>";</script>""" +
      """<!-- hidden <p>comment paragraph</p> -->""" +
      """<footer><a href="/t">Terms</a> <a href="/p">Privacy</a></footer></body></html>"""
    val out = runBoth(Seq((1L, page)))
    // n_blocks = 4 non-empty blocks: the <title> remnant ("T"), the nav
    // link text, the content paragraph, the footer link text; script /
    // style / comment blocks sanitize to empty and are never counted
    assert(out == Seq((1L,
      "This paragraph has plenty of real content words to pass every gate.", 4L, 1L)))
  }

  test("link-density gate: integer threshold, strictly below") {
    // cleaned = "aaaaaaaaaa bbbbbbbbb" (20 cp), link capture = 10 cp ->
    // 10*100 = 1000 == 20*50 -> NOT strictly below 50% -> dropped
    val border = """<p><a href="/x">aaaaaaaaaa</a> bbbbbbbbb</p>"""
    // 10*100 < 21*50=1050 -> kept
    val under = """<p><a href="/x">aaaaaaaaaa</a> bbbbbbbbbb</p>"""
    val r = HtmlRules(minChars = 5, minWords = 2, maxLinkDensityPct = 50)
    val out = runBoth(Seq((1L, border), (2L, under)), r)
    assert(out == Seq(
      (1L, "", 1L, 0L),
      (2L, "aaaaaaaaaa bbbbbbbbbb", 1L, 1L)))
  }

  test("unclosed script keeps tag-stripped content; unmatched '<' is literal text") {
    // no </script> -> the regex doesn't remove it; the <script ...> tag
    // itself strips like any tag, its content stays
    val page = "<p>before</p><script>leftover content here stays visible</p>" +
      "<p>trailing x < y comparison survives as text</p>"
    val r = HtmlRules(minChars = 10, minWords = 3, maxLinkDensityPct = 50)
    val out = runBoth(Seq((1L, page)), r)
    assert(out.head._2.contains("leftover content here stays visible"))
    assert(out.head._2.contains("x < y comparison survives as text"))
  }

  test("NULL html and empty html") {
    val df = Seq((1L, Option("")), (2L, Option.empty[String])).toDF("doc_id", "html")
    val out = HtmlExtract.extract(df)
      .orderBy("doc_id").select("doc_id", "html", "n_blocks", "n_kept")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out == Seq((1L, "", 0L, 0L), (2L, null, 0L, 0L)))
  }

  test("lengths are code points: non-BMP content and link text") {
    // 30 emoji = 30 code points >= minChars; and an all-emoji link capture
    // counts its code points, not bytes/UTF-16 units
    val content = "😀" * 30
    val page = s"<p>$content ok</p><p><a href='/x'>${"😀" * 10}</a> tail</p>"
    val r = HtmlRules(minChars = 25, minWords = 2, maxLinkDensityPct = 50)
    val out = runBoth(Seq((1L, page)), r)
    assert(out.head._2 == s"$content ok")
    assert(out.head._3 == 2L && out.head._4 == 1L)
  }

  test("case-insensitive tags; <pre>/<aside> are NOT block separators; <br/> is") {
    val page = "<P>Upper case paragraph tag with enough content words here.</P>" +
      "<pre>not a separator</pre>middle words enough to pass the gates fine" +
      "<BR/>after the break there are also enough content words here."
    val out = runBoth(Seq((1L, page)))
    // <pre> strips as a plain tag; its content merges with "middle words…"
    assert(out.head._4 == 3L)
    assert(out.head._2.contains("not a separator middle words"))
  }

  test("randomized parity: native ≡ column twin over fragment-assembled pages") {
    val rnd = new scala.util.Random(31)
    val frags = Vector(
      "<p>", "</p>", "<div class='x'>", "</div>", "<br>", "<li>", "</li>",
      "<a href='/u'>", "</a>", "<script>", "</script>", "<style>", "</style>",
      "<!--", "-->", "<b>", "</b>", "<", ">", " ", "  ",
      "plain words here", "the quick brown fox", "x", "née café", "😀 emoji",
      "1234", "terms of use", "longer run of ordinary content words to pass gates",
      // adversarial: case-variant tags, unclosed opens, tag-like non-tags,
      // boundary-failing names, attr-bearing separators, stray closers
      "<P>", "</DIV>", "<ScRiPt>", "</sTyLe>", "<a", "<scr", "<pre>", "</pre>",
      "<p class=\"x y\">", "<tablex>", "<h7>", "<h1>", "</a", "<!-- unclosed",
      "<a href=>click me</a>", "<div", "words<b>glued</b>words",
      // non-ASCII letter DIRECTLY after a tag name: ASCII boundary (native,
      // RE2 oracle, and the lookahead twin) says tag; Java \b said no-tag
      "<aé href='x'>linké</a>", "<pé>", "<divé>", "<scripté>not stripped</script>",
      "<styleé>kept text</style>", "<h1é>")
    val pages: Seq[(Long, String)] = (0L until 200L).map { i =>
      (i, Seq.fill(3 + rnd.nextInt(30))(frags(rnd.nextInt(frags.size))).mkString)
    }
    runBoth(pages)
    runBoth(pages, HtmlRules(minChars = 5, minWords = 1, maxLinkDensityPct = 30))
    runBoth(pages, HtmlRules(minChars = 0, minWords = 0, maxLinkDensityPct = 100))
  }

  test("guards: missing/colliding columns, invalid rules") {
    val df = Seq((1L, "<p>x</p>")).toDF("doc_id", "html")
    intercept[IllegalArgumentException](HtmlExtract.extract(df, htmlCol = "nope"))
    intercept[IllegalArgumentException](
      HtmlExtract.extract(df.withColumn("n_kept", lit(1))))
    intercept[IllegalArgumentException](HtmlRules(minChars = -1))
    intercept[IllegalArgumentException](HtmlRules(maxLinkDensityPct = 101))
  }
}
