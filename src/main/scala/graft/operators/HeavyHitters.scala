package graft.operators

import java.io.ByteArrayInputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Bounded-memory frequent-term mining — the two-pass count-min
  * pattern every at-scale corpus profiler uses (Cormode & Muthu-
  * krishnan's CM sketch as the candidate filter, an exact pass as the
  * verifier):
  *
  *  1. SKETCH: one `count_min_sketch` aggregation over the token
  *     stream — a fixed-size mergeable summary (partial-agg shape, no
  *     vocabulary-keyed shuffle).
  *  2. CANDIDATES: per-partition distinct terms probe the broadcast
  *     sketch; only terms whose ESTIMATE clears the threshold survive.
  *     CM never undercounts, so every true heavy hitter survives —
  *     the filter is lossless; overestimates only admit extra
  *     candidates for pass 3 to reject.
  *  3. EXACT: count only the candidates' occurrences (broadcast
  *     semi-join prune before the final shuffle) and keep the true
  *     `cnt · 1000 ≥ total` survivors. Output counts are EXACT —
  *     sketch parameters affect work, never results.
  *
  * Why it scales: at 100 TB the long-tail vocabulary (trillions of
  * rare terms) never enters the final count shuffle — the tail dies at
  * the map-side probe. The threshold is relative (one part in
  * `denom` of total tokens) and compared with pure integer arithmetic
  * (`cnt * denom >= total`), so there is no float boundary anywhere.
  */
object HeavyHitters {

  /** Terms whose exact occurrence count times `denom` reaches the
    * corpus token total, with exact counts. `eps`/`confidence`/`seed`
    * size the candidate sketch (defaults: 0.01% relative error at 99%
    * confidence — ~2 MB, broadcast-friendly).
    */
  def frequentTerms(docs: DataFrame, idCol: String, textCol: String,
                    denom: Long = 1000L, eps: Double = 1e-4,
                    confidence: Double = 0.99,
                    seed: Int = 42): DataFrame = {
    require(denom >= 1L, s"denom must be >= 1, got $denom")
    val spark = docs.sparkSession
    val terms = docs
      .select(explode(split(col(textCol), " ", -1)).as("term"))
      .filter(col("term") =!= "")
    val firstPass = terms.agg(
      count(lit(1)).as("total"),
      count_min_sketch(col("term"), lit(eps), lit(confidence),
        lit(seed)).as("cms")).head()
    val total = firstPass.getLong(0)
    val cmsBytes = firstPass.getAs[Array[Byte]](1)
    // empty/all-empty-token corpus: count_min_sketch over zero rows
    // yields a NULL sketch (and total == 0 makes the threshold
    // vacuous) — return the empty result instead of NPE-ing on the
    // sketch bytes
    if (total == 0L || cmsBytes == null) {
      return terms.groupBy(col("term"))
        .agg(count(lit(1)).as("cnt")).limit(0)
    }
    val cms = CountMinSketch.readFrom(new ByteArrayInputStream(cmsBytes))
    val bcCms = spark.sparkContext.broadcast(cms)
    val d = denom
    val estimateClears = udf((t: String) =>
      bcCms.value.estimateCount(t) * d >= total)
    // distinct is a vocab-sized partial-agg; the probe then kills the
    // tail BEFORE any occurrence-level work is shuffled
    val candidates = terms.distinct().filter(estimateClears(col("term")))
    terms
      .join(broadcast(candidates), Seq("term"), "left_semi")
      .groupBy(col("term"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(denom) >= lit(total))
  }
}
