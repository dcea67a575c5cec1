package graft.quality

import graft.functions.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CCNet-style perplexity bucketing (Wenzek et al. 2020,
  * arXiv:1911.00359): score every document with a language-model
  * signal, split each language's score distribution into terciles, and
  * tag documents head / middle / tail — the standard quality
  * stratification that downstream mixing samples from at different
  * rates. The LM here is the corpus-trained unigram model
  * ([[TextAnalysis.unigramLogProb]]; CCNet trains on Wikipedia — the
  * bucketing machinery is identical, swap the scorer).
  *
  * Scale shape: the APPROX path (default) computes both tercile
  * thresholds per language with one partial-combining
  * `percentile_approx` aggregation — no per-language window, so a
  * dominant language never funnels into one partition — then
  * broadcasts the tiny (languages × 2) threshold table back for a
  * map-side bucket tag. The EXACT path ranks within language (one
  * window whose per-language partition holds that language's corpus —
  * the a19/N9 exactness-gate trade) and picks ranks ceil(n/3),
  * ceil(2n/3); it exists to oracle the machinery, and its thresholds
  * are discrete order statistics both engines reproduce bit-for-bit.
  */
object Perplexity {

  /** (id, lang, n_tokens, mean_logprob, bucket) — bucket ∈
    * head/middle/tail by per-language tercile of the LM score
    * (head = most fluent). Ties sit in the lower bucket on both
    * engines (`<=` against a member value).
    */
  def buckets(df: DataFrame, idCol: String, textCol: String,
              langCol: String, exact: Boolean = false): DataFrame = {
    val scores = TextAnalysis.unigramLogProb(df, idCol, textCol)
      .join(df.select(col(idCol), col(langCol)), Seq(idCol))
    bucketize(scores, "mean_logprob", idCol, langCol, exact)
  }

  /** [[buckets]] scored by the REAL smoothed LM — the frozen
    * interpolated Kneser–Ney bigram model ([[TextAnalysis.KnModel]],
    * t15) instead of the in-corpus unigram tier. This is the CCNet
    * recipe proper: the model trains on a held-out/reference corpus
    * ([[TextAnalysis.kneserNeyModel]]; CCNet uses Wikipedia), every
    * document scores against it ([[TextAnalysis.kneserNeyScore]] —
    * pure per-doc function of the frozen count frames), and each
    * language's score distribution terciles into head/middle/tail.
    * Output: (id, lang, n_positions, n_unseen_bigrams, mean_logscore,
    * bucket). Docs under 2 tokens have no scoring positions and drop
    * (the t15 convention).
    *
    * Scale shape = t15's scoring joins (vocabulary-keyed shuffles for
    * the bigram/context/continuation frames — a bigram table grows
    * with data, never broadcast; the 1-row type total broadcasts)
    * plus [[bucketize]]'s threshold machinery (approx path: one
    * partial-combining percentile agg + a languages×2 broadcast back
    * — no corpus window).
    */
  def bucketsKn(df: DataFrame, idCol: String, textCol: String,
                langCol: String, m: TextAnalysis.KnModel,
                exact: Boolean = false): DataFrame = {
    val scores = TextAnalysis.kneserNeyScore(df, idCol, textCol, m)
      .join(df.select(col(idCol), col(langCol)), Seq(idCol))
    bucketize(scores, "mean_logscore", idCol, langCol, exact)
  }

  /** [[bucketsKn]] under the MODIFIED Kneser–Ney model
    * ([[TextAnalysis.KnModifiedModel]], t17 — Chen–Goodman's
    * estimated three-discount refinement, the KenLM default): what a
    * production CCNet deployment actually scores with. Same output
    * shape and scale posture as [[bucketsKn]]; the only additional
    * model state is the 1-row counts-of-counts broadcast.
    */
  def bucketsKnModified(df: DataFrame, idCol: String, textCol: String,
                        langCol: String, m: TextAnalysis.KnModifiedModel,
                        exact: Boolean = false): DataFrame = {
    val scores = TextAnalysis.kneserNeyModifiedScore(df, idCol, textCol, m)
      .join(df.select(col(idCol), col(langCol)), Seq(idCol))
    bucketize(scores, "mean_logscore", idCol, langCol, exact)
  }

  /** The shared tercile-tagging machinery over any per-doc score
    * frame (scoreCol is bit-identical cross-engine by the caller's
    * exactness discipline, so the EXACT path's order statistics
    * reproduce on both engines).
    */
  private[graft] def bucketize(scoresIn: DataFrame, scoreCol: String, idCol: String,
                               langCol: String, exact: Boolean): DataFrame = {
    // the per-doc score frame has TWO consumers — the threshold
    // aggregation and the bucket-tag join — and its lineage is the
    // whole scoring pipeline (tokenize + the LM's vocabulary-keyed
    // joins), so without a materialization point the scorer executes
    // twice per bucketing (r17; ppl_buckets_kn paid the four KN frame
    // joins both times). localCheckpoint is value-neutral and the
    // frame is one row per document — at 100 TB this is the score
    // table a production run lands in storage before thresholding.
    val scores = scoresIn.localCheckpoint()
    val thr = if (exact) exactTerciles(scores, scoreCol, idCol, langCol)
              else approxTerciles(scores, scoreCol, langCol)
    scores.join(broadcast(thr), Seq(langCol))
      .withColumn("bucket",
        when(col(scoreCol) <= col("t1"), lit("tail"))
          .when(col(scoreCol) <= col("t2"), lit("middle"))
          .otherwise(lit("head")))
      .drop("t1", "t2")
  }

  /** One agg, map-side combinable, no window — the 100 TB path. */
  private def approxTerciles(scores: DataFrame, scoreCol: String,
                             langCol: String): DataFrame =
    scores.groupBy(col(langCol))
      .agg(percentile_approx(col(scoreCol),
        array(lit(1.0 / 3), lit(2.0 / 3)), lit(10000)).as("t"))
      .select(col(langCol), col("t")(0).as("t1"), col("t")(1).as("t2"))

  /** Discrete order statistics at ranks ceil(n/3), ceil(2n/3) — the
    * groupQuartiles rank spelling, integer arithmetic on both engines.
    */
  private def exactTerciles(scores: DataFrame, scoreCol: String,
                            idCol: String, langCol: String): DataFrame = {
    val ranked = Window.partitionBy(col(langCol))
      .orderBy(col(scoreCol), col(idCol))
    val whole = Window.partitionBy(col(langCol))
    scores
      .withColumn("__rn", row_number().over(ranked))
      .withColumn("__n", count(lit(1)).over(whole))
      .filter(col("__rn") === expr("(__n + 2) div 3") ||
        col("__rn") === expr("(2 * __n + 2) div 3"))
      .groupBy(col(langCol))
      .agg(
        min(when(col("__rn") === expr("(__n + 2) div 3"),
          col(scoreCol))).as("t1"),
        min(when(col("__rn") === expr("(2 * __n + 2) div 3"),
          col(scoreCol))).as("t2"))
  }
}
