package graft.profile

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sketch aggregates: no cross-engine oracle exists (HLL/KLL internals
  * are engine-specific), so the gate here is accuracy bounds against
  * the exact answers at test scale.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within 5% of exact; percentile_approx brackets exact median") {
    val li = graft.core.Tables.lineitem(spark, sf0001).cache()
    val exactNd = li.select(countDistinct($"l_partkey")).as[Long].head()
    val approxNd = li.select(approx_count_distinct($"l_partkey")).as[Long].head()
    assert(math.abs(approxNd - exactNd).toDouble / exactNd < 0.05,
      s"approx=$approxNd exact=$exactNd")

    val exactP50 = li.stat.approxQuantile("l_extendedprice", Array(0.5), 0.0).head
    val approxP50 = li.select(percentile_approx($"l_extendedprice", lit(0.5), lit(10000)))
      .as[Double].head()
    val spread = li.select(max($"l_extendedprice") - min($"l_extendedprice")).as[Double].head()
    assert(math.abs(approxP50 - exactP50) / spread < 0.02,
      s"p50 approx=$approxP50 exact=$exactP50")
  }
}
