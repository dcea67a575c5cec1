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
    mergeIslands(hits, idCol, minSpanTokens)
  }

  /** EXACT Lee-et-al long-span dedup — the suffix-array criterion
    * ("mask every position inside a substring of ≥ L tokens occurring
    * ≥ `minCount` times in the corpus") computed relationally, no
    * suffix array. The identity that makes it exact at token
    * granularity: a position lies inside SOME ≥L-token substring with
    * ≥ k corpus occurrences ⇔ it lies inside some L-GRAM with ≥ k
    * occurrences. (⇐: a frequent L-gram IS such a substring. ⇒: every
    * occurrence of the long substring contributes an occurrence of
    * each of its L-grams, so each has count ≥ k; position p of a span
    * [s, s+m), m ≥ L, is covered by the L-gram starting at
    * max(s, min(p, s+m−L)).) The paper's suffix array is an
    * efficiency device for BYTE granularity — the semantics need only
    * the L-gram occurrence census. Counting is per OCCURRENCE (a doc
    * repeating its own 50-token block twice masks it), the paper's
    * corpus-occurrence criterion — contrast ds1/ds3's distinct-doc
    * census, whose per-gram doc-freq contract is pinned separately
    * (SpanMaskSpec's rare-gram-gap arm).
    *
    * Scale shape: the census shuffle carries (id, pos, md5(gram)) —
    * 16 bytes of hash, never the L-token string (content equality
    * modulo md5 collision, the repo's fingerprint convention; the
    * oracle replays the same md5) — and the frequency filter is ONE
    * hash-keyed window (no census join-back, the candidatePairs
    * annotation discipline); island merging is the shared doc-keyed
    * window. Two shuffles total. The per-position gram build is
    * O(L) — a rolling hash would make it O(1), but md5-of-string is
    * the cross-engine-replayable spelling.
    */
  def maskDuplicatedSpansExact(df: DataFrame, idCol: String, textCol: String,
                               spanTokens: Int,
                               minCount: Long = 2L): DataFrame = {
    require(spanTokens >= 1, s"spanTokens must be >= 1, got $spanTokens")
    require(minCount >= 2, s"minCount must be >= 2, got $minCount")
    val grams = positionedGrams(df, idCol, textCol, spanTokens)
    val byHash = Window.partitionBy(col("__h"))
    val hits = grams
      .select(col(idCol), col("pos"), md5(col("gram")).as("__h"))
      .withColumn("__c", count(lit(1)).over(byHash))
      .filter(col("__c") >= minCount)
      .select(col(idCol), col("pos"),
        (col("pos") + spanTokens).as("__end"))
    // merged islands are ≥ spanTokens by construction (each hit covers
    // exactly L positions), so no length filter is needed
    mergeIslands(hits, idCol, minSpanTokens = 0L)
  }

  /** Gaps-and-islands merge of (id, pos, __end) hit intervals — the
    * shared tail of the approximate and exact span maskers: one
    * doc-keyed window (both window functions and the final agg share
    * the exchange).
    */
  private def mergeIslands(hits: DataFrame, idCol: String,
                           minSpanTokens: Long): DataFrame = {
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
                           minSpanTokens: Long = 0L): DataFrame =
    stripBySpans(df, idCol, textCol,
      maskDuplicatedSpans(df, idCol, textCol, n, minDocFreq, minSpanTokens))

  /** [[stripDuplicatedSpans]] under the EXACT criterion (see
    * [[maskDuplicatedSpansExact]]): every position inside a ≥L-token
    * substring with ≥ `minCount` corpus occurrences is removed.
    */
  def stripDuplicatedSpansExact(df: DataFrame, idCol: String, textCol: String,
                                spanTokens: Int,
                                minCount: Long = 2L): DataFrame =
    stripBySpans(df, idCol, textCol,
      maskDuplicatedSpansExact(df, idCol, textCol, spanTokens, minCount))

  private def stripBySpans(df: DataFrame, idCol: String, textCol: String,
                           spans: DataFrame): DataFrame = {
    val masked = spans
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
