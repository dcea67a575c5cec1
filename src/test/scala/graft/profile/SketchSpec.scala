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

  test("HLL sketch union: composable partials stay within tolerance") {
    import graft.core.Tables
    val d = Tables.documents(spark, sf0001)
    // per-shard sketches union into a whole-corpus estimate without
    // re-scanning — the 100 TB composability story. The ESTIMATE is
    // not bit-stable across layouts (measured 491 vs 493 under a
    // repartition: HLL_4 partials promote LIST→SET→HLL at different
    // points, so the union gadget sees different inputs), which is
    // exactly why a21 gates a tolerance FLAG, not the estimate. The
    // contract: within tolerance of exact under EVERY layout.
    def merged(src: org.apache.spark.sql.DataFrame): Long =
      src.groupBy($"source").agg(hll_sketch_agg($"doc_id").as("sk"))
        .select(hll_sketch_estimate(hll_union_agg($"sk"))).as[Long].head()
    val exact = d.select(countDistinct($"doc_id")).as[Long].head()
    for (layout <- Seq(d, d.repartition(7, $"doc_id"), d.orderBy($"doc_id".desc))) {
      val est = merged(layout)
      assert(math.abs(est - exact).toDouble / exact <= 0.05,
        s"est=$est exact=$exact")
    }
  }
}
