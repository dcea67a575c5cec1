package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token-window chunking — the training-data export step that turns
  * variable-length documents into fixed-budget training chunks
  * (context-window packing's simpler sibling; every LLM data pipeline
  * has one between curation and tokenization).
  *
  * Semantics: tokens = whitespace split (the corpus-wide convention
  * shared with TextDedup/TextAnalysis and the DuckDB oracles); chunk i
  * starts at token offset i*stride and takes up to `size` tokens, for
  * every start offset < n_tokens. With stride < size consecutive
  * chunks overlap by (size - stride) tokens — the standard trick so no
  * span of `size - stride` tokens is ever split across a chunk
  * boundary without also appearing whole in some chunk.
  *
  * Scale design: one codegen'd projection + generate (posexplode) —
  * NO shuffle, no UDF, no interpreted lambda (the per-row loop is
  * `sequence` + `slice` + `array_join`, all native expressions). Output
  * grows by ~size/stride ×; at 100 TB that fan-out happens map-side and
  * flows straight into the sink, never through an exchange.
  */
object Chunker {

  /** (idCol, chunk_id, chunk_text, chunk_tokens) — one row per chunk,
    * chunk_id counting from 0 per document. Empty/short documents yield
    * exactly one chunk (their whole token list).
    */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    size: Int, stride: Int): DataFrame = {
    require(size > 0, s"chunk size must be positive, got $size")
    require(stride > 0 && stride <= size,
      s"stride must be in [1, size=$size], got $stride")
    val toks: Column = split(col(textCol), " ", -1)
    df.select(col(idCol), toks.as("__toks"))
      .select(col(idCol), col("__toks"),
        // start offsets 0, stride, 2*stride, … strictly below n_tokens
        // (array_size, not size: the param name shadows functions.size)
        posexplode(sequence(lit(0), array_size(col("__toks")) - 1, lit(stride)))
          .as(Seq("chunk_id", "__start")))
      .select(
        col(idCol),
        col("chunk_id").cast("long").as("chunk_id"),
        array_join(slice(col("__toks"), col("__start") + 1, lit(size)), " ")
          .as("chunk_text"),
        least(lit(size), array_size(col("__toks")) - col("__start"))
          .cast("long").as("chunk_tokens"))
  }

  /** DuckDB spelling of the same chunking over `src(id, text)` —
    * 1-based list slicing, range() with an explicit step.
    */
  def chunkSql(src: String, id: String, text: String,
               size: Int, stride: Int): String =
    s"""(SELECT $id,
       |   CAST(s // $stride AS BIGINT) AS chunk_id,
       |   array_to_string(t[s + 1 : s + $size], ' ') AS chunk_text,
       |   CAST(LEAST($size, len(t) - s) AS BIGINT) AS chunk_tokens
       | FROM (SELECT $id, string_split($text, ' ') AS t FROM $src) d
       | CROSS JOIN LATERAL unnest(range(0, len(t), $stride)) AS u(s))""".stripMargin

  /** Middle truncation — the long-document strategy that keeps the
    * head AND the tail (titles/intros and conclusions carry most
    * signal; the middle is what a context budget drops): documents at
    * or under `head + tail` tokens pass through UNCHANGED (boundary
    * inclusive), longer ones keep the first `head` and last `tail`
    * tokens. One codegen'd projection — split/slice/join, no shuffle,
    * no fan-out.
    */
  def truncateMiddle(df: DataFrame, idCol: String, textCol: String,
                     head: Int, tail: Int): DataFrame = {
    require(head > 0 && tail > 0,
      s"head and tail must be positive, got $head/$tail")
    val toks: Column = split(col(textCol), " ", -1)
    val n = array_size(toks).cast("long")
    df.select(col(idCol), n.as("n_toks"),
      greatest(n - (head + tail), lit(0L)).as("n_dropped"),
      when(n <= head + tail, col(textCol))
        .otherwise(concat(
          array_join(slice(toks, 1, head), " "), lit(" "),
          array_join(slice(toks, -tail, tail), " ")))
        .as("text"))
  }

  /** DuckDB spelling of [[truncateMiddle]] over `src(id, text)`. */
  def truncateMiddleSql(src: String, id: String, text: String,
                        head: Int, tail: Int): String =
    s"""(SELECT $id, CAST(len(t) AS BIGINT) AS n_toks,
       |   CAST(GREATEST(len(t) - ${head + tail}, 0) AS BIGINT) AS n_dropped,
       |   CASE WHEN len(t) <= ${head + tail} THEN $text
       |     ELSE array_to_string(t[1 : $head], ' ') || ' ' ||
       |          array_to_string(t[-$tail :], ' ') END AS text
       | FROM (SELECT $id, $text, string_split($text, ' ') AS t
       |       FROM $src) d)""".stripMargin
}
