package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-window chunking: split each document into fixed-size token windows
  * with a stride — the context-window preparation step between curation and
  * packing (embedding models and retrieval corpora both consume overlapping
  * windows; training pipelines consume non-overlapping ones,
  * stride = window).
  *
  * Tokenization is the shared whitespace contract
  * ([[graft.functions.TextFunctions.tokens]]) so chunk boundaries agree
  * with every other text operator (and the SQL oracle recomputes them).
  * The last window of a document is partial (`n_chunk_tokens` < window)
  * rather than dropped — truncation policy belongs to the caller.
  *
  * Scale shape: tokenize → `sequence` of window starts → `posexplode` →
  * `slice`+`array_join`, all native codegen'd expressions inside the scan
  * projection — NO shuffle, no HOF lambdas, no state. Output rows ≈
  * input tokens / stride; the explode multiplies rows, never columns, and
  * Spark's columnar-to-row boundary handles that shape natively.
  */
object Chunking {

  /** Adds one row per (document, window), PRESERVING every input column
    * (like the sibling Packing/Curation operators — metadata such as
    * lang/source rides along), plus `chunk_id` (0-based window ordinal),
    * `chunk_text` (space-joined window tokens), `n_chunk_tokens`
    * (= `window` except for the final partial window). NULL text produces
    * zero rows for that document (tokenize → NULL → explode drops it).
    *
    * @param stride start-to-start distance; `stride < window` overlaps,
    *               `stride = window` partitions, `stride > window` samples
    */
  def tokenWindows(df: DataFrame, idCol: String, textCol: String,
                   window: Int, stride: Int): DataFrame = {
    require(window > 0, s"Chunking: window must be positive, got $window")
    require(stride > 0, s"Chunking: stride must be positive, got $stride")
    Seq(idCol, textCol).foreach(c => require(df.columns.contains(c),
      s"Chunking: input has no '$c' column"))
    Seq("chunk_id", "chunk_text", "n_chunk_tokens",
        "__graft_toks", "__graft_n", "__graft_start").foreach(c =>
      require(!df.columns.contains(c),
        s"Chunking: input already has a '$c' column — rename it before chunking"))
    val inputCols = df.columns.toSeq.map(col)
    df.withColumn("__graft_toks", graft.functions.TextFunctions.tokens(col(textCol)))
      .withColumn("__graft_n", size(col("__graft_toks")))
      .select(inputCols ++ Seq(col("__graft_toks"), col("__graft_n"),
        // The NULL guard is load-bearing: greatest() IGNORES nulls, so
        // without it a NULL text would produce greatest(NULL-1, 0) = 0 →
        // sequence [0] → one phantom all-NULL chunk row instead of zero rows.
        posexplode(when(col("__graft_n").isNotNull,
            sequence(lit(0), greatest(col("__graft_n") - 1, lit(0)), lit(stride))))
          .as(Seq("chunk_id", "__graft_start"))): _*)
      .select(inputCols ++ Seq(col("chunk_id"),
        array_join(slice(col("__graft_toks"), col("__graft_start") + 1, lit(window)), " ")
          .as("chunk_text"),
        least(lit(window), col("__graft_n") - col("__graft_start")).as("n_chunk_tokens")): _*)
  }
}
