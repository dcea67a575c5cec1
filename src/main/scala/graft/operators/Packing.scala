package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concat-and-chunk sequence packing — the GPT-style training-data
  * export step: documents are laid end-to-end in a deterministic
  * pseudorandom order (md5 of the id — the Sinks.shuffledShards order)
  * and the concatenated token stream is cut into fixed `seqLen`
  * windows ("packs"). Output is the doc↔pack span map: one row per
  * (document, pack) intersection, from which a writer can assemble
  * each pack's token ids and attention-mask boundaries.
  *
  * Scale design — the global prefix sum is the whole problem here: a
  * naive `sum(n) OVER (ORDER BY h)` is a single-partition window (all
  * 100 TB through one task). Instead the md5 order is split into
  * `buckets` contiguous ranges keyed by the md5 PREFIX (so bucket
  * order == global order), and the offset is assembled in two narrow
  * phases: (1) a per-bucket cumulative sum — a keyed window, all
  * buckets in parallel; (2) bucket base offsets from the per-bucket
  * totals — a window over ≤`buckets` aggregated rows (constant-size by
  * construction; the only SinglePartition stage touches ≤2^16 rows),
  * broadcast-joined back. Pack assignment is then pure per-row
  * arithmetic + a bounded `sequence` fan-out (a doc spans
  * ceil(n/seqLen)+1 packs at most), map-side, no further shuffle.
  */
object Packing {

  /** Length-bucketed batching census — the pad-vs-pack alternative to
    * [[packSpans]]: instead of concatenating across documents, each
    * doc is assigned the smallest power-of-two-ish bucket that holds
    * it (docs beyond the largest boundary clamp to it — the truncation
    * regime), and the census reports what a fixed-shape batcher would
    * PAY per bucket: docs, batches at `batchSize`, real tokens, padding
    * waste (bucket − len, 0 when truncated), and the waste ratio. This
    * readout is how bucket boundaries are chosen BEFORE a training run
    * commits to them; it is one projection + one 8-key agg, so it runs
    * at any corpus size for the cost of a scan.
    *
    * Output: bucket, n_docs, n_batches, sum_tokens, padding_waste,
    * waste_ratio. All integers exact int64; the ratio is one shared
    * IEEE division.
    */
  def lengthBuckets(counts: DataFrame, nTokCol: String,
                    boundaries: Seq[Int], batchSize: Int): DataFrame =
    bucketCensus(bucketAssign(counts, nTokCol, boundaries), batchSize)

  /** The per-row half of [[lengthBuckets]]: (bucket, kept, waste) for
    * each document — a pure codegen'd projection (no state), so it is
    * shared verbatim by the streaming face (DocStream.lengthCensus),
    * which makes batch == converged-stream true by construction.
    */
  def bucketAssign(counts: DataFrame, nTokCol: String,
                   boundaries: Seq[Int]): DataFrame = {
    require(boundaries.nonEmpty && boundaries == boundaries.sorted,
      "boundaries must be ascending")
    val n = col(nTokCol).cast("long")
    val maxB = boundaries.last.toLong
    val bucket = boundaries.init.foldRight(lit(maxB)) { (b, rest) =>
      when(n <= b, lit(b.toLong)).otherwise(rest)
    }
    counts.select(bucket.as("bucket"),
      least(n, lit(maxB)).as("kept"),
      greatest(bucket - n, lit(0L)).as("waste"))
  }

  /** The aggregate half of [[lengthBuckets]] over [[bucketAssign]]'s
    * output — one 8-key agg, legal as a streaming Complete-mode
    * aggregation because every column is an algebraic aggregate of the
    * per-row projection (partial-agg shape; the ratio is a post-agg
    * row function).
    */
  def bucketCensus(assigned: DataFrame, batchSize: Int): DataFrame = {
    assigned
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        // ceil-div via floor: counts sit far below 2^53, so the double
        // round-trip is exact and DuckDB spells it identically
        floor((count(lit(1)) + batchSize - 1) / batchSize).cast("long").as("n_batches"),
        sum(col("kept")).as("sum_tokens"),
        sum(col("waste")).as("padding_waste"))
      .select(col("bucket"), col("n_docs"), col("n_batches"),
        col("sum_tokens"), col("padding_waste"),
        (col("padding_waste").cast("double") /
          (col("bucket") * col("n_docs")).cast("double")).as("waste_ratio"))
  }

  /** Data-driven bucket boundaries — [[lengthBuckets]]'s planning
    * input: exact token-length quantiles at k/parts for k = 1..parts-1
    * via the value-domain trick. The cumulative window runs over
    * DISTINCT length values (bounded by max doc length, never corpus
    * size); each boundary is the smallest length whose cumulative
    * count crosses the rank, decided by cross-multiplied int64
    * (cum·parts ≥ k·n) — the order statistic is exact on any engine.
    */
  def suggestBoundaries(counts: DataFrame, nTokCol: String,
                        parts: Int): DataFrame = {
    require(parts >= 2, s"parts must be >= 2, got $parts")
    val hist = counts.select(col(nTokCol).cast("long").as("len"))
      .groupBy(col("len")).agg(count(lit(1)).as("cnt"))
    val cumd = hist.select(col("len"),
      sum(col("cnt")).over(Window.orderBy(col("len"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .as("cum"))
    val tot = hist.agg(sum(col("cnt")).as("n"))
    val j = cumd.crossJoin(broadcast(tot))
    (1 until parts).map(k =>
      j.filter(col("cum") * parts >= col("n") * k)
        .agg(min(col("len")).as("boundary"))
        .select(lit(k.toLong).as("k"), col("boundary")))
      .reduce(_.unionAll(_))
  }

  /** (pack_id, doc_id, doc_off, pack_off, n_toks): `n_toks` tokens
    * starting at token `doc_off` of the document land in pack
    * `pack_id` at position `pack_off`. Every pack except the last has
    * exactly `seqLen` tokens (documents straddle pack boundaries —
    * concat-and-chunk, no padding).
    *
    * Tokens = whitespace split (the corpus-wide convention shared with
    * Chunker/TextDedup and the DuckDB oracles).
    */
  def packSpans(df: DataFrame, idCol: String, textCol: String,
                seqLen: Int, buckets: Int = 256): DataFrame =
    spansFromCounts(
      df.select(col(idCol),
        size(split(col(textCol), " ", -1)).cast("long").as("__n")),
      idCol, seqLen, buckets)

  /** The span map over a frame that already carries per-document
    * token counts as `__n` — the shared core of [[packSpans]]
    * (whitespace tokens) and [[packSequences]] (BPE ids + separator).
    */
  private def spansFromCounts(counts: DataFrame, idCol: String,
                              seqLen: Int, buckets: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    require(buckets > 0 && buckets <= 65536,
      s"buckets must be in [1, 65536], got $buckets")
    // bucket key = leading md5 nibbles: string prefix ⇒ ordering by
    // (bucket, h) == ordering by h, which makes the two-phase prefix
    // sum exact. Nibbles, so `buckets` must be a power of 16 ≤ 16^4;
    // round down to one (16^0=1 disables bucketing — test-size inputs).
    // Integer arithmetic: a float log could truncate 16^k to k-1
    // nibbles on a platform where log(16^k)/log(16) lands below k.
    val nibbles = Iterator.iterate(1L)(_ * 16).takeWhile(_ * 16 <= buckets).length
    val h = md5(col(idCol).cast("string"))
    // the explicit isNotNull matches the null filter the inner join
    // infers on the probe side — without it the two subtrees hanging
    // off this exchange canonicalize differently and ReuseExchange
    // cannot collapse them to one scan
    val base = counts.select(col(idCol), h.as("__h"), col("__n"))
      .withColumn("__b", substring(col("__h"), 1, nibbles))
      .filter(col("__b").isNotNull)

    // phase 1: cumulative token count within each md5-prefix bucket
    val inBucket = Window.partitionBy(col("__b"))
      .orderBy(col("__h"), col(idCol))
    val cumd = base.withColumn("__cum", sum(col("__n")).over(inBucket))

    // phase 2: per-bucket totals → exclusive base offsets (≤ buckets
    // rows; the SinglePartition window is over this aggregate only).
    // Totals come from the windowed side's running sum (max(cum) ==
    // bucket total since cum is monotone within a bucket) so the agg
    // hangs off the SAME exchange as phase 1 — ReuseExchange makes
    // this a single corpus scan, where aggregating `base` again would
    // read the input twice.
    val bucketBase = cumd.groupBy(col("__b"))
      .agg(max(col("__cum")).as("__bt"))
      .withColumn("__base",
        coalesce(
          sum(col("__bt")).over(
            Window.orderBy(col("__b"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__b"), col("__base"))

    val offs = cumd.join(broadcast(bucketBase), Seq("__b"))
      .select(col(idCol), col("__n"),
        (col("__base") + col("__cum") - col("__n")).as("__start"))

    // pack fan-out: doc [start, start+n) intersects packs
    // start div L .. (start+n-1) div L — integer `div`, matching the
    // oracle's `//` at ANY offset (float floor(a/b) is only exact while
    // global token offsets stay under 2^53)
    offs
      .select(col(idCol), col("__n"), col("__start"),
        explode(sequence(
          expr(s"__start div $seqLen"),
          expr(s"(__start + __n - 1) div $seqLen"))).as("pack_id"))
      .select(
        col("pack_id"),
        col(idCol),
        (greatest(col("__start"), col("pack_id") * seqLen) - col("__start"))
          .as("doc_off"),
        (greatest(col("__start"), col("pack_id") * seqLen)
          - col("pack_id") * seqLen).as("pack_off"),
        (least(col("__start") + col("__n"), (col("pack_id") + 1) * seqLen)
          - greatest(col("__start"), col("pack_id") * seqLen)).as("n_toks"))
  }

  /** Per-pack fill census over the span map: distinct documents and
    * token fill per pack (== seqLen everywhere but the final pack).
    */
  def packFill(spans: DataFrame): DataFrame =
    spans.groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("fill"))

  /** DuckDB spelling of the same span map over `src(id, text)` — the
    * oracle uses the plain global-window prefix sum (same semantics;
    * fine at verify scale).
    */
  def packSpansSql(src: String, id: String, text: String,
                   seqLen: Int): String =
    s"""(WITH t AS (
       |   SELECT $id, md5(CAST($id AS VARCHAR)) AS h,
       |          CAST(len(string_split($text, ' ')) AS BIGINT) AS n
       |   FROM $src),
       | o AS (
       |   SELECT $id, n,
       |          CAST(sum(n) OVER (ORDER BY h, $id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n
       |            AS BIGINT) AS s
       |   FROM t)
       | SELECT CAST(u.p AS BIGINT) AS pack_id, $id,
       |        GREATEST(s, u.p * $seqLen) - s AS doc_off,
       |        GREATEST(s, u.p * $seqLen) - u.p * $seqLen AS pack_off,
       |        LEAST(s + n, (u.p + 1) * $seqLen)
       |          - GREATEST(s, u.p * $seqLen) AS n_toks
       | FROM o CROSS JOIN LATERAL
       |   unnest(range(s // $seqLen, (s + n - 1) // $seqLen + 1)) AS u(p))""".stripMargin

  /** Dense cross-document training sequences — the step [[packSpans]]
    * maps out and a dataloader actually consumes: each document's BPE
    * id array gets a `sepId` end-of-document separator appended (the
    * GPT convention), the id streams are laid end-to-end in the
    * deterministic md5 order, and the concatenation is cut into
    * `seqLen`-id packs. Every pack except the last is exactly full —
    * no per-document padded tails (contrast the per-doc windows of
    * `tk6_token_shards`, where every tail under `seqLen` ships as a
    * fragment).
    *
    * Input is [[graft.functions.Bpe.tokenizeToIds]]'s shape:
    * `(idCol, nCol = token count, idsCol = array<int> ids)`.
    *
    * Scale design: the global offset is the [[packSpans]] bucketed
    * two-phase prefix sum (no corpus-wide single-partition window);
    * span enumeration is a bounded map-side fan-out; each span then
    * SLICES its id segment out of the document row BEFORE the
    * pack-keyed shuffle, so the exchange carries ≤`seqLen` ids per
    * row, never whole documents; pack assembly is one keyed agg whose
    * groups are ≤`seqLen` ids by construction. The `ids` input is
    * consumed twice (offset derivation + segment join) — at scale pass
    * a persisted/checkpointed frame so tokenization doesn't run twice.
    */
  def packSequences(ids: DataFrame, idCol: String, idsCol: String,
                    nCol: String, seqLen: Int, sepId: Int,
                    buckets: Int = 256): DataFrame = {
    val withSep = ids.select(col(idCol),
      concat(col(idsCol), array(lit(sepId))).as("__ids"),
      (col(nCol) + lit(1L)).as("__n"))
    val spans = spansFromCounts(withSep.select(col(idCol), col("__n")),
      idCol, seqLen, buckets)
    spans.join(withSep, Seq(idCol))
      .select(col("pack_id"), col("pack_off"), col("n_toks"),
        slice(col("__ids"), (col("doc_off") + lit(1L)).cast("int"),
          col("n_toks").cast("int")).as("__seg"))
      .groupBy(col("pack_id"))
      .agg(
        sum(col("n_toks")).as("n_ids"),
        flatten(transform(
          array_sort(collect_list(struct(col("pack_off"), col("__seg")))),
          s => s("__seg"))).as("ids"))
  }

  /** DuckDB spelling of [[packSequences]] over `idsSrc(id,
    * n_bpe_tokens, bpe_ids)` where `bpe_ids` is the comma-joined id
    * string ([[graft.functions.Bpe.idsSql]]'s output shape): append
    * the separator, plain global-window prefix sum (verify scale),
    * slice each span's segment, reassemble per pack in `pack_off`
    * order. Emits `ids` as the comma-joined string (the a15 collection
    * convention — the harness cannot hash ARRAY columns).
    */
  def packSequencesSql(idsSrc: String, id: String, seqLen: Int,
                       sepId: Int): String =
    s"""(WITH w AS (
       |   SELECT $id, md5(CAST($id AS VARCHAR)) AS h,
       |          n_bpe_tokens + 1 AS n,
       |          bpe_ids || ',$sepId' AS sids
       |   FROM $idsSrc),
       | o AS (
       |   SELECT $id, n, sids,
       |          CAST(sum(n) OVER (ORDER BY h, $id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n
       |            AS BIGINT) AS s
       |   FROM w),
       | sp AS (
       |   SELECT CAST(u.p AS BIGINT) AS pack_id,
       |          GREATEST(s, u.p * $seqLen) - u.p * $seqLen AS pack_off,
       |          LEAST(s + n, (u.p + 1) * $seqLen)
       |            - GREATEST(s, u.p * $seqLen) AS n_toks,
       |          array_to_string(string_split(sids, ',')[
       |            GREATEST(s, u.p * $seqLen) - s + 1 :
       |            GREATEST(s, u.p * $seqLen) - s
       |              + LEAST(s + n, (u.p + 1) * $seqLen)
       |              - GREATEST(s, u.p * $seqLen)], ',') AS seg
       |   FROM o CROSS JOIN LATERAL
       |     unnest(range(s // $seqLen, (s + n - 1) // $seqLen + 1)) AS u(p))
       | SELECT pack_id, CAST(SUM(n_toks) AS BIGINT) AS n_ids,
       |        string_agg(seg, ',' ORDER BY pack_off) AS ids
       | FROM sp GROUP BY pack_id)""".stripMargin
}
