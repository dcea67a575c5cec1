package graft.quality

import graft.dedup.TextDedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gopher-style document quality rules (Rae et al. 2021, the canonical
  * pre-training corpus ruleset), restated over the whitespace-token
  * convention the rest of the engine shares: a document passes iff
  *   R1 word count ∈ [minWords, maxWords]
  *   R2 mean word length ∈ [3, 10]
  *   R3 ≥ 80% of words contain only letters
  *   R4 ≥ 2 stopword hits (the Gopher 8-stopword set)
  * The profile emits the raw counters, each rule as an int bit, and
  * the combined verdict — threshold tuning reads the counters, the
  * corpus cut filters on `pass`.
  *
  * Exactness: every rule is INTEGER arithmetic — the mean-length and
  * ratio bounds are stated in cross-multiplied form (sum_len ≥ 3·n,
  * 10·n_alpha ≥ 8·n) so no float ever enters a verdict; `mean_word_len`
  * is additionally emitted for humans as one shared IEEE division of
  * exact longs. Scale shape: one compiled token explode (the t1 shape)
  * and one doc-keyed partial-combining agg; rules are a codegen'd
  * projection.
  */
object GopherRules {

  /** The Gopher stopword set (Rae et al., §A1.1). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  def profile(docs: DataFrame, idCol: String, textCol: String,
              minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    require(minWords >= 1 && maxWords >= minWords,
      s"bad word-count bounds [$minWords, $maxWords]")
    val toks = TextDedup.shingleSets(docs, idCol, textCol, k = 1,
      distinct = false)
    val g = toks.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_words"),
      sum(length(col("shingle"))).as("sum_len"),
      sum(when(col("shingle").rlike("\\A[A-Za-z]+\\z"), 1L).otherwise(0L))
        .as("n_alpha_words"),
      sum(when(lower(col("shingle")).isin(GopherStopwords: _*), 1L)
        .otherwise(0L)).as("n_stop_hits"))
    g.select(col(idCol), col("n_words"), col("sum_len"),
      col("n_alpha_words"), col("n_stop_hits"),
      (col("sum_len").cast("double") / col("n_words").cast("double"))
        .as("mean_word_len"),
      (col("n_words") >= minWords && col("n_words") <= maxWords)
        .cast("int").as("r_wordcount"),
      (col("sum_len") >= lit(3L) * col("n_words") &&
        col("sum_len") <= lit(10L) * col("n_words"))
        .cast("int").as("r_meanlen"),
      (lit(10L) * col("n_alpha_words") >= lit(8L) * col("n_words"))
        .cast("int").as("r_alpha"),
      (col("n_stop_hits") >= 2L).cast("int").as("r_stop"))
      .withColumn("pass",
        (col("r_wordcount") === 1 && col("r_meanlen") === 1 &&
          col("r_alpha") === 1 && col("r_stop") === 1).cast("int"))
  }

  /** The auxiliary symbol rules (Rae et al. §A1.1, the half `profile`
    * doesn't carry): symbol-to-word ratio over '#' and ellipsis
    * ('...' and U+2026 — each '...' counted once via the replace-length
    * trick on the 3-char form), and the fraction of purely numeric
    * words. Rules: symbols ≤ 10 % of words; numeric words ≤ 20 % —
    * both cross-multiplied int64, inclusive. All counts are per-row
    * char/token arithmetic + one doc-keyed agg for the numeric-word
    * count; no float enters a verdict.
    */
  def auxProfile(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextDedup.shingleSets(docs, idCol, textCol, k = 1,
      distinct = false)
    val g = toks.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_words"),
      sum(when(col("shingle").rlike("\\A[0-9]+\\z"), 1L).otherwise(0L))
        .as("n_numeric_words"))
    val t = col(textCol)
    val sym = docs.select(col(idCol),
      (length(t) - length(regexp_replace(t, "#", ""))).cast("long")
        .as("n_hash"),
      ((length(t) - length(regexp_replace(t, "\\.\\.\\.", "x"))) / 2 +
        (length(t) - length(regexp_replace(t, "…", ""))))
        .cast("long").as("n_ellipsis"))
    sym.join(g, Seq(idCol))
      .select(col(idCol), col("n_words"), col("n_hash"),
        col("n_ellipsis"), col("n_numeric_words"),
        (lit(10L) * (col("n_hash") + col("n_ellipsis")) <= col("n_words"))
          .cast("int").as("r_symbol"),
        (lit(5L) * col("n_numeric_words") <= col("n_words"))
          .cast("int").as("r_numeric"))
      .withColumn("pass",
        (col("r_symbol") === 1 && col("r_numeric") === 1).cast("int"))
  }

  /** The surviving corpus: documents passing all rules, columns
    * intact (semi-join on the passing ids; the profile side aggregates
    * to one row per doc, so the join is id-keyed and
    * broadcast-eligible when the survivor set is small).
    */
  def filterPass(docs: DataFrame, idCol: String, textCol: String,
                 minWords: Int = 50, maxWords: Int = 100000): DataFrame =
    docs.join(
      profile(docs, idCol, textCol, minWords, maxWords)
        .filter(col("pass") === 1).select(col(idCol)),
      Seq(idCol), "left_semi")
}
