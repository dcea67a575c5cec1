package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Substring-level deduplication — the span-masking step of the
  * exact-substring dedup recipe (Lee et al., "Deduplicating Training
  * Data Makes Language Models Better"): document- and near-dup-level
  * passes keep one copy of each DOCUMENT, but boilerplate sentences,
  * license headers, and templated fragments recur inside documents
  * that are otherwise unique. This operator finds token spans covered
  * by n-grams that occur in ≥ `minDocFreq` distinct documents and
  * masks (or strips) them, at n-gram granularity rather than the
  * paper's suffix-array byte granularity — the join-friendly
  * formulation of the same idea.
  *
  * Scale design, stage by stage: positioned n-grams come from the
  * same compiled flatMap as TextDedup's shingles (no interpreted HOF
  * in the per-token loop); the gram census is a two-stage
  * partial-aggregated groupBy (the shuffle carries (gram, partial),
  * never documents); frequent grams — tiny by the boilerplate
  * argument, capped like Boilerplate's census — broadcast back, so
  * the corpus-sized gram stream is filtered map-side; span merging is
  * the classic gaps-and-islands pass as ONE doc-keyed window (both
  * window functions and the final agg share the exchange), parallel
  * across documents. Nothing in the chain sorts globally.
  */
object SpanMask {

  /** (id, pos, gram): the n-gram starting at 0-based token `pos`. */
  def positionedGrams(df: DataFrame, idCol: String, textCol: String,
                      n: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // null text yields no grams (see TextDedup.shingleSets note)
    df.select(col(idCol).cast("long"), col(textCol))
      .filter(col(textCol).isNotNull)
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = text.split(" ", -1)
        if (toks.length < n) Iterator.empty
        else toks.sliding(n).zipWithIndex.map {
          case (w, i) => (id, i.toLong, w.mkString(" "))
        }
      }
      .toDF(idCol, "pos", "gram")
  }

  /** Grams occurring in ≥ `minDocFreq` DISTINCT documents (the
    * cross-document repetition census — within-doc repeats don't
    * count, matching the "shared boilerplate" target).
    */
  def frequentGrams(grams: DataFrame, idCol: String,
                    minDocFreq: Long): DataFrame = {
    require(minDocFreq > 1,
      s"minDocFreq must exceed 1 (every gram occurs in its own doc), got $minDocFreq")
    grams.select(col(idCol), col("gram")).distinct()
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") >= minDocFreq)
  }

  /** Merged mask spans per document: (id, span_start, span_end,
    * n_tokens), `span_end` exclusive, overlapping/adjacent hit spans
    * coalesced (gaps-and-islands over one doc-keyed window).
    *
    * `minSpanTokens` is the Lee-et-al. span-length knob: the paper's
    * recipe removes only duplicated substrings of ≥ L tokens (50 BPE
    * tokens in the paper), so that a short shared idiom or named
    * entity survives while genuine boilerplate blocks are caught. The
    * default 0 keeps the ds1/ds2 n-gram-granularity behavior (every
    * merged island masks). The filter runs AFTER island merging — a
    * 60-token span assembled from overlapping 5-gram hits is one
    * island of 60 tokens, not twelve short ones — and costs one
    * predicate on the already-aggregated (doc, island) rows.
    */
  def maskDuplicatedSpans(df: DataFrame, idCol: String, textCol: String,
                          n: Int, minDocFreq: Long,
                          minSpanTokens: Long = 0L): DataFrame = {
    val grams = positionedGrams(df, idCol, textCol, n)
    val frequent = frequentGrams(grams, idCol, minDocFreq).select(col("gram"))
    val hits = grams.join(broadcast(frequent), Seq("gram"))
      .select(col(idCol), col("pos"), (col("pos") + n).as("__end"))
    val byPos = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    hits
      // a hit starts a new span iff no earlier hit's span reaches it
      .withColumn("__maxend",
        max(col("__end")).over(byPos.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new",
        when(col("__maxend").isNull || col("pos") > col("__maxend"), 1)
          .otherwise(0))
      .withColumn("__grp", sum(col("__new")).over(
        byPos.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("__grp"))
      .agg(min(col("pos")).as("span_start"), max(col("__end")).as("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("n_tokens"))
      .filter(col("n_tokens") >= lit(minSpanTokens))
  }

  /** Documents with their masked spans REMOVED (tokens outside every
    * span, original order, single-space rejoin — exact for the
    * single-spaced tokenization convention the whole corpus layer
    * uses). Documents masked in full disappear, the Boilerplate
    * contract; documents with no frequent span pass through verbatim.
    */
  def stripDuplicatedSpans(df: DataFrame, idCol: String, textCol: String,
                           n: Int, minDocFreq: Long,
                           minSpanTokens: Long = 0L): DataFrame = {
    val masked = maskDuplicatedSpans(df, idCol, textCol, n, minDocFreq,
        minSpanTokens)
      .select(col(idCol),
        explode(sequence(col("span_start"), col("span_end") - 1)).as("pos"))
    val toks = df
      .select(col(idCol).cast("long").as(idCol),
        posexplode(split(col(textCol), " ", -1)).as(Seq("pos", "__tok")))
      .select(col(idCol), col("pos").cast("long").as("pos"), col("__tok"))
    toks.join(masked, Seq(idCol, "pos"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("pos"), col("__tok")))),
          s => s("__tok")),
        " ").as(textCol))
  }
}
