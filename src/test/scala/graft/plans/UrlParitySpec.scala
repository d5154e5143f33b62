package graft.plans

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Native UrlCanonical ≡ the column-algebra twin, byte for byte — including
  * the engine-semantics corners the native pass inherits by running the
  * twin's exact java.util.regex patterns ($-before-final-newline in the
  * fragment strip, `.*` not crossing line terminators in the query
  * extract, trailing empty params from split("&", -1)).
  */
class UrlParitySpec extends SparkSpec {
  import spark.implicits._

  private def runBoth(urls: Seq[String]): Unit = {
    val df = urls.toDF("u").repartition(3)
    val rows = df.select(
      TextFunctions.normalizeUrl(col("u")).as("native"),
      TextFunctions.normalizeUrlColumns(col("u")).as("twin"),
      col("u")).collect()
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"input='${r.getString(2)}' native='${r.getString(0)}' twin='${r.getString(1)}'")
    }
  }

  test("curated corners: decorations, ports, fragments, non-URLs, newlines") {
    runBoth(Seq(
      "HTTPS://Site1.Example.COM:443/Path/3?utm_source=x&id=2&fbclid=c77",
      "http://host.example:80/a?x=1",
      "http://host.example:8080/a?x=1",        // non-default port kept
      "https://h/p?utm_a=1&utm_b=2",           // query collapses entirely
      "https://h/p?&&x=1&",                    // empty params dropped
      "https://h/p#frag?x=1",                  // fragment strips before query parse
      "ftp://H.O.S.T/Path",                    // other scheme: lowercased head only
      "not a url at all",                      // pass-through
      "",                                      // empty
      "https://h:443",                         // no path, default port
      "http://h:80?utm_x=1",                   // port then query, no path
      "https://UPPER.host/CaseKeptPath?ref=1&REF=2", // ref dropped, REF kept (case-sensitive)
      "https://h/p?a=1#f1#f2",                 // multiple #
      "https://h/p?a=\n&b=2",                  // newline inside query
      "https://h/p?a=1\n",                     // trailing newline ($ quirk)
      "https://h/p\n?a=1",                     // newline before ?
      "x://y?utm_source=only",                 // scheme-shaped, all-tracking query
      "https://h/p??a=1",                      // double ?
      "https://h/p?mc_cid=1&mc_eid=2&id=3"))
  }

  test("randomized assembled URLs match the twin") {
    val rnd = new scala.util.Random(4242)
    val schemes = Seq("http://", "HTTPS://", "ftp://", "", "ht tp://")
    val hosts = Seq("Example.COM", "a.b.c", "h:80", "h:443", "h:8080", "")
    val paths = Seq("", "/", "/Path/X", "/p#f", "/p\nq")
    val queries = Seq("", "?x=1", "?utm_source=a&x=1", "?fbclid=1", "?a=1&a=2&",
      "?gclid=\n1", "?ref=x&id=9", "?&")
    val urls = (0 until 400).map { _ =>
      schemes(rnd.nextInt(schemes.size)) + hosts(rnd.nextInt(hosts.size)) +
        paths(rnd.nextInt(paths.size)) + queries(rnd.nextInt(queries.size))
    }
    runBoth(urls)
  }

  test("null passes through as null") {
    val r = Seq[String](null).toDF("u")
      .select(TextFunctions.normalizeUrl(col("u"))).collect()
    assert(r(0).isNullAt(0))
  }
}
