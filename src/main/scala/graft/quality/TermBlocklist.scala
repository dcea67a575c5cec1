package graft.quality

import graft.dedup.TextDedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Doc-level banned-term gate — the C4-style "badwords" filter: a
  * document containing ANY blocklisted term (case-insensitive, token
  * boundaries — "scanner" does not hit "scan" because matching is on
  * whole whitespace tokens, the same tokenization every other text
  * operator here uses) is dropped from the corpus; the profile face
  * reports per-document hit counts for threshold tuning before the
  * cut. Distinct from `t8_stopword_filter` (which strips tokens but
  * keeps the doc) and `cu4_blocklist` (URL domain level).
  *
  * Scale shape: the term list broadcasts (blocklists are 100s–1000s
  * of entries); hits are a map-side broadcast hash join on the token
  * stream, the per-doc profile aggregates ONLY hit rows (blocklist
  * hit rate is low by construction), and the keep face is a broadcast
  * anti-join on the hit doc ids — the corpus itself never reshuffles,
  * the same layout as Boilerplate/Decontam. If a pathological
  * blocklist hits most of the corpus, drop the broadcast hint and the
  * identical plan degrades to a shuffle anti-join.
  */
object TermBlocklist {

  private def hitTokens(docs: DataFrame, idCol: String, textCol: String,
                        terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "blocklist must be non-empty")
    val spark = docs.sparkSession
    import spark.implicits._
    val t = terms.map(_.toLowerCase).distinct.toDF("__term")
    TextDedup.shingleSets(docs, idCol, textCol, k = 1, distinct = false)
      .withColumn("__tok", lower(col("shingle")))
      .join(broadcast(t), col("__tok") === col("__term"))
  }

  /** Per-document hit profile over documents with ≥ 1 hit:
    * (idCol, n_hits, n_terms) — total banned-token occurrences and
    * distinct banned terms present.
    */
  def profile(docs: DataFrame, idCol: String, textCol: String,
              terms: Seq[String]): DataFrame =
    hitTokens(docs, idCol, textCol, terms)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"),
        countDistinct(col("__tok")).as("n_terms"))

  /** The surviving corpus: documents with zero blocklist hits, all
    * input columns intact.
    */
  def filterClean(docs: DataFrame, idCol: String, textCol: String,
                  terms: Seq[String]): DataFrame =
    docs.join(
      broadcast(hitTokens(docs, idCol, textCol, terms)
        .select(col(idCol)).distinct()),
      Seq(idCol), "left_anti")
}
