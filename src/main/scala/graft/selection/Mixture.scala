package graft.selection

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-mixture construction: temperature-scaled source weights
  * (the GPT-3 §2.2 / DoReMi-family reweighting) — small high-quality
  * sources are up-sampled relative to their raw token share by
  * exponentiating the share at α < 1. α is FIXED at 1/2 here because
  * `sqrt` is IEEE-correctly-rounded on every engine (java.lang.Math,
  * libm, DuckDB all agree bit-for-bit), where a general `pow(x, α)`
  * is not — so the whole readout stays oracle-exact with NO
  * quantization step: w_s = sqrt(n_toks_s), p_s = w_s / Σw, and the
  * token allocation at a fixed budget is floor(p_s · B). The epochs
  * column (alloc / n_toks) is the up-sampling factor a data loader
  * applies per source — >1 means the source repeats within one pass
  * of the mixture.
  *
  * Exactness: token counts are exact int64; sqrt / the ONE ordered
  * fold for Σw (index-ordered, the dd2/ts2 convention: fold in source
  * order both sides) / division / floor are pure IEEE with identical
  * trees engine- and oracle-side.
  *
  * Scale shape: one partial-aggregated groupBy(source) over the scan,
  * then arithmetic over |sources| rows (the fold and the broadcast
  * total touch ≤ thousands of rows — sources are domains, not docs).
  */
object Mixture {

  def domainWeights(docs: DataFrame, textCol: String, sourceCol: String,
                    budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val per = docs.groupBy(col(sourceCol)).agg(
      count(lit(1)).as("n_docs"),
      sum(graft.functions.TextAnalysis.tokenCount(col(textCol))
        .cast("long")).as("n_toks"))
    val withW = per.withColumn("w", sqrt(col("n_toks").cast("double")))
    // Σw as an index-ordered fold (sorted by source) so the addition
    // sequence is bit-identical to the oracle's list_reduce
    val tot = withW.agg(aggregate(
      sort_array(collect_list(struct(col(sourceCol), col("w")))),
      lit(0.0), (acc, s) => acc + s("w")).as("tw"))
    withW.crossJoin(broadcast(tot))
      .select(col(sourceCol), col("n_docs"), col("n_toks"), col("w"),
        (col("w") / col("tw")).as("p"),
        floor(col("w") / col("tw") * budget).cast("long").as("alloc_toks"))
      .select(col(sourceCol), col("n_docs"), col("n_toks"), col("w"),
        col("p"), col("alloc_toks"),
        when(col("n_toks") > 0,
          col("alloc_toks").cast("double") / col("n_toks").cast("double"))
          .otherwise(lit(0.0)).as("epochs"))
  }
}
