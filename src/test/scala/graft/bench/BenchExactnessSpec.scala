package graft.bench

import graft.core.Tables
import graft.operators.Exact
import org.apache.spark.sql.functions._

/** The r17 bench pipelines replaced decimal-routed exact sums with
  * exact integer-cents arithmetic in the hot aggregates (range_join,
  * join_agg). These arms hold the cents spelling to BIT identity with
  * the decimal route over the real fixtures — the contract that makes
  * the optimization a re-spelling, not a semantic change.
  */
class BenchExactnessSpec extends graft.SparkSpec {
  import spark.implicits._

  test("join_agg cents revenue is bit-identical to the decimal route") {
    val cents = (c: org.apache.spark.sql.Column) =>
      floor(c * 100.0 + 0.5).cast("long")
    val both = Tables.lineitem(spark, sf0001)
      .join(Tables.orders(spark, sf0001), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus")
      .agg(
        sum(Exact.dec($"l_extendedprice") * (lit(1) - Exact.dec($"l_discount")))
          .cast("double").as("dec_rev"),
        (sum(cents($"l_extendedprice") * (lit(100L) - cents($"l_discount")))
          .cast("double") / 10000.0).as("cents_rev"))
      .select($"dec_rev", $"cents_rev").as[(Double, Double)].collect()
    assert(both.nonEmpty)
    both.foreach { case (d, c) =>
      assert(java.lang.Double.doubleToRawLongBits(d) ==
        java.lang.Double.doubleToRawLongBits(c), s"$d != $c")
    }
  }

  test("bench joinAgg matches the pre-r17 decimal spelling row for row") {
    val old = Tables.lineitem(spark, sf0001)
      .join(Tables.orders(spark, sf0001), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(Exact.dec($"l_extendedprice") * (lit(1) - Exact.dec($"l_discount")))
          .cast("double").as("revenue"))
      .orderBy($"o_orderstatus")
      .as[(String, Long, Double)].collect().toSeq
    val now = Pipelines.joinAgg(spark, sf0001)
      .orderBy($"o_orderstatus")
      .as[(String, Long, Double)].collect().toSeq
    assert(old == now)
    assert(now.nonEmpty)
  }
}
