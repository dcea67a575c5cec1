package graft.selection

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Curriculum ordering for a training run (Bengio et al. 2009's
  * easy-first schedule, industrialized): band the corpus into score
  * terciles (band 1 = highest-score / easiest first), then shuffle
  * deterministically WITHIN each band so the model sees a random mix
  * of comparable difficulty — band-major, md5-shuffled-within — and
  * emit the (band, shard, pos) address every reader derives
  * identically. The within-band shuffle matters: band-sorted-by-score
  * order would feed near-identical documents back to back.
  *
  * Scale shape: banding is a threshold compare against a broadcast
  * 1-row threshold table. The default (`exact = false`) computes
  * thresholds with one partial-combining `percentile_approx` agg — no
  * global window anywhere, the 100 TB path (the Perplexity
  * approx/exact trade, same rationale). `exact = true` derives the
  * thresholds as discrete order statistics at ranks ceil(n/3),
  * ceil(2n/3) of the DESC-ordered corpus — one global rank window,
  * which is the oracle-able spelling both engines reproduce
  * bit-for-bit; it exists to gate the machinery. Shard assignment is
  * an md5 bucket (map-side), and positions are dense ranks within
  * (band, shard) — partition size n/(3·nShards), bounded by the shard
  * dial, never the corpus.
  *
  * Ties at a threshold sit in the EASIER band on both engines
  * (`>=` against a member value — the Perplexity tie rule, flipped
  * for DESC).
  */
object Curriculum {

  /** (id, band, shard, pos): band ∈ 1..3 easiest-first, shard ∈
    * 0..nShards-1, pos = 1-based dense position within (band, shard)
    * in deterministic md5-shuffle order.
    */
  def shardOrder(docs: DataFrame, idCol: String, scoreCol: String,
                 nShards: Int, exact: Boolean = false): DataFrame = {
    val thr = if (exact) exactThresholds(docs, idCol, scoreCol)
              else approxThresholds(docs, scoreCol)
    val h = md5(col(idCol).cast("string"))
    val shard = (conv(substring(h, 1, 8), 16, 10).cast("long")
      % nShards).cast("int")
    docs.join(broadcast(thr))
      .withColumn("band",
        when(col(scoreCol) >= col("u1"), lit(1))
          .when(col(scoreCol) >= col("u2"), lit(2))
          .otherwise(lit(3)))
      .withColumn("shard", shard)
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("band"), col("shard"))
          .orderBy(h, col(idCol))))
      .select(col(idCol), col("band"), col("shard"), col("pos"))
  }

  /** One agg, map-side combinable — the corpus-scale path. */
  private def approxThresholds(docs: DataFrame, scoreCol: String): DataFrame =
    docs.agg(percentile_approx(col(scoreCol),
        array(lit(2.0 / 3), lit(1.0 / 3)), lit(10000)).as("t"))
      .select(col("t")(0).as("u1"), col("t")(1).as("u2"))

  /** Discrete order statistics at DESC ranks ceil(n/3), ceil(2n/3) —
    * cross-engine exact, used by the oracle gate.
    */
  private def exactThresholds(docs: DataFrame, idCol: String,
                              scoreCol: String): DataFrame =
    docs
      .withColumn("__rn", row_number().over(
        Window.orderBy(col(scoreCol).desc, col(idCol))))
      .withColumn("__n", count(lit(1)).over(
        Window.partitionBy()))
      .filter(col("__rn") === expr("(__n + 2) div 3") ||
        col("__rn") === expr("(2 * __n + 2) div 3"))
      .agg(
        min(when(col("__rn") === expr("(__n + 2) div 3"),
          col(scoreCol))).as("u1"),
        min(when(col("__rn") === expr("(2 * __n + 2) div 3"),
          col(scoreCol))).as("u2"))
}
