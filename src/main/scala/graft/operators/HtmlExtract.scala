package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.HtmlTextExtract.HtmlRules

/** Raw-HTML → text extraction operator (the pipeline stage BEFORE
  * [[Lines]]-style line cleaning in a CommonCrawl-shaped corpus): see
  * [[graft.plans.HtmlTextExtract]] for the exact step algebra (strip
  * script/style/comments → split on block tags → per-block link-density /
  * length / word gates → rejoin content blocks). The operator is a
  * ZERO-shuffle scan projection like [[Lines.filterLines]] — the keep
  * decision is a pure per-document function, so partitioning is preserved
  * and the whole thing fuses into the scan at any corpus size.
  */
object HtmlExtract {

  /** Replace `htmlCol` with the extracted text plus `n_blocks` (non-empty
    * blocks seen) and `n_kept` (blocks surviving the gates). NULL html →
    * NULL text, 0 counts. Runs the native one-pass expression; the output
    * column keeps the input column's NAME (the [[Lines]] convention: the
    * cleaned corpus flows to the next stage under the same schema).
    */
  def extract(df: DataFrame, rules: HtmlRules = HtmlRules(),
              htmlCol: String = "html"): DataFrame = {
    require(df.columns.contains(htmlCol), s"HtmlExtract: input has no '$htmlCol' column")
    Seq("n_blocks", "n_kept", "__graft_html").foreach(c => require(!df.columns.contains(c),
      s"HtmlExtract: input already has a '$c' column — rename it first"))
    val st = graft.plans.HtmlExpressions.htmlExtract(col(htmlCol), rules)
    // struct aliased in one select, fields extracted in a second, so the
    // non-cheap expression is never inlined per consumer (the PiiStats
    // pattern; plan pinned in PlanPropertiesSpec)
    val replaced = df.columns.toSeq.map {
      case c if c == htmlCol => col("__graft_html.text").as(htmlCol)
      case c                 => col(c)
    }
    df.select(df.columns.map(col).toSeq :+ st.as("__graft_html"): _*)
      .select(replaced ++ Seq(
        coalesce(col("__graft_html.n_blocks"), lit(0L)).as("n_blocks"),
        coalesce(col("__graft_html.n_kept"), lit(0L)).as("n_kept")): _*)
  }

  /** Column-algebra twin of the native expression — the step algebra
    * written as literal `regexp_replace`/`split`/`regexp_extract_all`
    * column functions (parity pinned in HtmlExtractSpec; the DuckDB oracle
    * is the same algebra in SQL). Interpreted HOFs inside — a correctness
    * twin, not a hot path.
    */
  def extractColumns(html: Column, rules: HtmlRules = HtmlRules()): Column = {
    // (?![A-Za-z0-9_]) after tag names, not \b — Java's \b is Unicode-aware
    // while the native scanner and the RE2 oracle use ASCII boundaries;
    // the lookahead makes the twin byte-for-byte identical on e.g. '<aé'.
    val sanitized = regexp_replace(
      regexp_replace(
        regexp_replace(html, "(?is)<script(?![A-Za-z0-9_])[^>]*>.*?</script>", " "),
        "(?is)<style(?![A-Za-z0-9_])[^>]*>.*?</style>", " "),
      "(?s)<!--.*?-->", " ")
    val blocks = split(sanitized, graft.plans.HtmlTextExtract.blockSplitPattern)
    val marked = transform(blocks, b => {
      val cleaned = trim(regexp_replace(regexp_replace(b, "<[^>]*>", " "), "\\s+", " "))
      val linkChars = aggregate(
        regexp_extract_all(b, lit("(?is)<a(?![A-Za-z0-9_])[^>]*>(.*?)</a>"), lit(1)),
        lit(0), (acc, x) => acc + length(x))
      val len = length(cleaned)
      val words = when(len === 0, 0).otherwise(size(split(cleaned, " ")))
      struct(
        cleaned.as("t"),
        (len >= rules.minChars && words >= rules.minWords &&
          linkChars * 100 < len * rules.maxLinkDensityPct).as("k"))
    })
    struct(
      array_join(transform(filter(marked, m => m("k")), m => m("t")), "\n").as("text"),
      size(filter(marked, m => length(m("t")) > 0)).cast("long").as("n_blocks"),
      size(filter(marked, m => m("k"))).cast("long").as("n_kept"))
  }
}
