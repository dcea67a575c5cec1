package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Histogram builders. The fixed-width form is a pure projection
  * (h1); equi-depth needs order statistics, which forces a choice:
  *
  *  - exact (h2's gate): global ntile — a single-task total sort,
  *    correct only for bounded/profiling inputs;
  *  - scale path (this file): cutpoints from `percentile_approx`
  *    (KLL-ish mergeable sketch, one partial-combined aggregate), then
  *    one codegen'd bucket projection over the full data. Two narrow
  *    passes, no global sort, no row ever leaves its partition except
  *    inside the tiny sketch merge — the 100 TB spelling, trading
  *    exactly-equal depths for parallelism (depth error bounded by the
  *    sketch accuracy).
  */
object Histograms {

  /** Equi-depth bucket assignment + per-bucket stats. Buckets are
    * `[cut(i-1), cut(i))` over `accuracy`-grade approximate quantile
    * cutpoints; bucket ids are 1..buckets. Returns one row per
    * non-empty bucket: bucket, cnt, lo, hi. NULL values are excluded
    * up front: `percentile_approx` already ignores them when fitting
    * the cutpoints, and without the filter `col >= cut` evaluates null
    * so every null row would silently land in (and inflate) bucket 1.
    */
  def equiDepthApprox(df: DataFrame, valueCol: String, buckets: Int,
                      accuracy: Int = 10000): DataFrame = {
    require(buckets >= 2, s"need >= 2 buckets, got $buckets")
    val probs = (1 until buckets).map(_.toDouble / buckets)
    val nonNull = df.filter(col(valueCol).isNotNull)
    // the cutpoint collect is bounded (buckets-1 doubles) and explicit —
    // same contract as Pivots.dynamicPivot. Unrolling the cutpoints
    // into a literal when-chain keeps the bucket projection inside
    // whole-stage codegen; an array-HOF fold over a broadcast array
    // would run interpreted per row.
    val cutsArr: Seq[Double] = nonNull
      .agg(percentile_approx(col(valueCol), array(probs.map(lit): _*),
        lit(accuracy)).as("cuts"))
      .first().getSeq[Double](0)
    val bucketId: Column = cutsArr.foldLeft(lit(1): Column) { (acc, c) =>
      acc + when(col(valueCol) >= lit(c), 1).otherwise(0)
    }
    nonNull.withColumn("bucket", bucketId)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"),
        min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"))
      .orderBy(col("bucket"))
  }
}
