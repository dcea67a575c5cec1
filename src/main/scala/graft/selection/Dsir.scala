package graft.selection

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169): score every raw document by how much more likely
  * its hashed n-gram features are under a small high-quality TARGET
  * corpus than under the raw corpus itself, then sample the top of the
  * importance distribution with the Gumbel-top-k trick.
  *
  * Scale shape (why this survives 100 TB where a classifier doesn't):
  *  - features are hashed into a FIXED number of buckets, so both
  *    language models are bounded-size (`buckets` rows) no matter how
  *    large either corpus grows — they broadcast, and scoring is a
  *    map-side join;
  *  - feature extraction is one compiled flatMap per row (unigrams +
  *    bigrams in a single pass — no second scan, and no interpreted
  *    HOF lambda in the hot loop);
  *  - bucket-count aggregation partial-combines to ≤ `buckets` rows per
  *    partition before any shuffle;
  *  - the per-doc score is one id-keyed partial-combining sum — the
  *    single corpus-sized shuffle in the pipeline;
  *  - Gumbel-top-k is `orderBy(...).limit(k)` → TakeOrderedAndProject,
  *    k rows per partition cross the wire, never the corpus.
  *
  * Cross-engine discipline: the bucket hash is the md5-derived 32-bit
  * base hash ([[graft.dedup.TextDedup]] convention), per-feature
  * log-ratios and Gumbel noise are quantized to int64 millionths with
  * the t9 nudge (`floor(x*1e6 + 1e-4)`) so DuckDB reproduces every
  * weight and every selection decision bit-for-bit.
  */
object Dsir {

  /** Hash-bucket count; 1024 keeps the oracle cheap while the paper's
    * 10k is a config away — the scale story is identical (model size
    * is `buckets`, independent of corpus size).
    */
  val DefaultBuckets = 1024

  private val Scale = 1e6

  private def quantize(x: Column): Column =
    floor(x * lit(Scale) + lit(1e-4)).cast("long")

  /** md5-derived 32-bit hash of a string column (TextDedup's base-hash
    * spelling — DuckDB: `('0x' || substr(md5(f), 1, 8))::BIGINT`).
    */
  private def hash32(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** (id, bucket) rows: one per unigram and bigram OCCURRENCE (counts
    * matter for importance weights, so no distinct), hashed into
    * `buckets` buckets. Tokenization is `split(' ', -1)` to match
    * DuckDB `string_split`; a doc always has ≥ 1 unigram, and docs
    * with a single token simply carry no bigrams.
    */
  def hashedFeatures(df: DataFrame, idCol: String, textCol: String,
                     buckets: Int = DefaultBuckets): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // null text contributes no features (see TextDedup.shingleSets note)
    df.select(col(idCol).cast("long"), col(textCol))
      .filter(col(textCol).isNotNull)
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = text.split(" ", -1)
        val uni = toks.iterator.map(t => (id, t))
        val bi =
          if (toks.length < 2) Iterator.empty
          else toks.sliding(2).map(w => (id, w.mkString(" ")))
        uni ++ bi
      }
      .toDF(idCol, "feat")
      .select(col(idCol), (hash32(col("feat")) % buckets).as("bucket"))
  }

  /** Bounded bucket-count model: ≤ `buckets` rows regardless of input
    * size (absent buckets are implicit zeros — smoothing in
    * [[importanceWeights]] handles them).
    */
  def bucketCounts(features: DataFrame): DataFrame =
    features.groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))

  /** Per-document importance weight under add-one-smoothed hashed
    * bucket models: logw(x) = Σ_f [ln p̂_target(b(f)) − ln p̂_raw(b(f))]
    * with p̂(b) = (cnt_b + 1) / (total + buckets). Output: (id, n_feats,
    * logw_q, logw) — `logw_q` is the exact int64 sum of quantized
    * per-feature terms (the key [[gumbelTopK]] builds on), `logw` its
    * double reading.
    *
    * Scan accounting (what matters at 100 TB): the RAW corpus streams
    * exactly twice — once into its count model, once through scoring —
    * because the raw total rides the model itself (one global window
    * over the ≤ `buckets`-row aggregate; Packing's bounded-single-
    * partition contract, not a corpus window). The TARGET corpus is
    * small by assumption (it's the curated reference) and feeds its
    * count model and its one-row total independently. A dense-model
    * variant that also folded the target total into a `buckets`-row
    * broadcast measured 2.2× SLOWER end-to-end at sf0.1 (the extra
    * build stages cost more than the concurrent tiny scans they
    * saved), so the sparse left-join + one-row cross join stays.
    */
  def importanceWeights(raw: DataFrame, target: DataFrame,
                        idCol: String, textCol: String,
                        buckets: Int = DefaultBuckets): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    val fRaw = hashedFeatures(raw, idCol, textCol, buckets)
    val fTgt = hashedFeatures(target, idCol, textCol, buckets)
    val cRaw = bucketCounts(fRaw)
      .withColumn("t_raw", sum(col("cnt")).over(w))
      .select(col("bucket"), col("cnt").as("c_raw"), col("t_raw"))
    val cTgt = bucketCounts(fTgt)
    val tTgt = cTgt.agg(sum(col("cnt")).as("t_tgt"))
    val term = quantize(
      log((coalesce(col("c_tgt"), lit(0L)) + 1).cast("double") /
        (col("t_tgt") + buckets).cast("double")) -
      log((col("c_raw") + 1).cast("double") /
        (col("t_raw") + buckets).cast("double")))
    fRaw
      .join(broadcast(cTgt.select(col("bucket"), col("cnt").as("c_tgt"))),
        Seq("bucket"), "left")
      .join(broadcast(cRaw), Seq("bucket"))
      .crossJoin(broadcast(tTgt))
      .select(col(idCol), term.as("lp_q"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum(col("lp_q")).as("logw_q"),
        (sum(col("lp_q")).cast("double") / lit(Scale)).as("logw"))
  }

  /** Gumbel-top-k selection: sampling k docs without replacement with
    * probability ∝ exp(logw) equals taking the top k of
    * logw + Gumbel(0,1) noise. The noise is seeded md5 arithmetic —
    * u = (h32(seed:id) + 1) / (2^32 + 1) ∈ (0,1), g = −ln(−ln u) — so
    * the kept set is a pure function of (seed, id): stable under
    * repartitioning, retries, and engines (the r3/r4 hash-sampling
    * contract), unlike RNG sampling. Key and tiebreak are integer
    * (quantized g + exact logw_q, then id), so the selection is a
    * deterministic total order.
    */
  def gumbelTopK(weights: DataFrame, idCol: String, k: Int,
                 seed: String): DataFrame = {
    val u = (hash32(concat(lit(seed), lit(":"), col(idCol).cast("string")))
      + 1).cast("double") / lit(4294967297.0) // 2^32 + 1
    val keyQ = (col("logw_q") + quantize(-log(-log(u)))).as("key_q")
    weights.select(col(idCol), col("logw"), keyQ)
      .orderBy(col("key_q").desc, col(idCol))
      .limit(k)
  }

  // ------------------------------------------------------- DuckDB spellings

  object Sql {
    /** CTE body over `src(id, text)`: (id, bucket) per unigram and
      * bigram occurrence — the [[hashedFeatures]] twin.
      */
    def hashedFeatures(src: String, id: String, text: String,
                       buckets: Int = DefaultBuckets): String = {
      val h = "(('0x' || substr(md5(feat), 1, 8))::BIGINT)"
      s"""(SELECT $id, $h % $buckets AS bucket FROM (
         |  SELECT $id, unnest(string_split($text, ' ')) AS feat FROM $src
         |  UNION ALL
         |  SELECT $id, t[i] || ' ' || t[i+1] AS feat
         |  FROM (SELECT $id, string_split($text, ' ') AS t FROM $src) s
         |  CROSS JOIN LATERAL unnest(generate_series(1, len(t) - 1)) AS u(i)
         |  WHERE len(t) >= 2) f)""".stripMargin
    }

    /** Quantized per-feature log-ratio term, matching
      * [[importanceWeights]]'s `term` (columns c_tgt, c_raw, t_tgt,
      * t_raw in scope).
      */
    def termQ(buckets: Int = DefaultBuckets): String =
      s"""CAST(FLOOR((ln(CAST(COALESCE(c_tgt, 0) + 1 AS DOUBLE) / CAST(t_tgt + $buckets AS DOUBLE))
         |  - ln(CAST(COALESCE(c_raw, 0) + 1 AS DOUBLE) / CAST(t_raw + $buckets AS DOUBLE)))
         |  * 1000000.0 + 0.0001) AS BIGINT)""".stripMargin

    /** Quantized Gumbel key addend for [[gumbelTopK]] over an `id`
      * column: `key_q = logw_q + gumbelQ(seed, id)`.
      */
    def gumbelQ(seed: String, id: String): String = {
      val h = s"(('0x' || substr(md5('$seed:' || CAST($id AS VARCHAR)), 1, 8))::BIGINT)"
      s"""CAST(FLOOR(-ln(-ln(CAST($h + 1 AS DOUBLE) / 4294967297.0))
         |  * 1000000.0 + 0.0001) AS BIGINT)""".stripMargin
    }
  }
}
