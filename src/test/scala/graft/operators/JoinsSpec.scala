package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Boundary load for the join gates that the oracle compare can't
  * carry by itself — in particular the j3 anti join, whose fixture
  * side is exhaustive (every customer has orders), so without the
  * planted orderless customers the gate compares empty-to-empty.
  */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("j3 anti join returns exactly the planted orderless customers") {
    val out = Catalog.queries("j3_join_anti")(spark, sf001)
      .as[Long].collect().toSeq
    // the plant: every 97th custkey, offset by 1e8 — custkeys at
    // sf0.01 are 0..1499, so plants are 1e8 + {0, 97, 194, ...}
    val expected = (0L until 1500L).filter(_ % 97 == 0)
      .map(_ + 100000000L)
    assert(out.nonEmpty, "anti-join gate must carry rows")
    assert(out == expected)
    // and none of the planted keys exist on the orders side
    val orders = graft.core.Tables.orders(spark, sf001)
      .filter(col("o_custkey") >= 100000000L).count()
    assert(orders == 0L)
  }

  test("anti join with a non-empty survivor set vs groupBy-derived truth") {
    val cust = Seq(1L, 2L, 3L, 4L, 5L).toDF("c_custkey")
    val orders = Seq((10L, 1L), (11L, 1L), (12L, 3L)).toDF("o_orderkey", "o_custkey")
    val anti = cust.join(orders, $"c_custkey" === $"o_custkey", "left_anti")
      .as[Long].collect().toSet
    assert(anti == Set(2L, 4L, 5L))
  }

  test("j4 semi join EXCLUDES the planted orderless customers") {
    // boundary the j4 gate's count can't carry alone: the semi join
    // must filter — a pass-through would count the plants too
    val out = Catalog.queries("j4_join_semi")(spark, sf001)
      .as[(Long, Long)].collect().head
    val nCust = graft.core.Tables.customer(spark, sf001).count()
    val nPlanted = (0L until nCust).count(_ % 97 == 0)
    assert(out._1 == nCust, "every real customer has orders in the fixture")
    assert(nPlanted > 0 && out._1 < nCust + nPlanted,
      "plants must be excluded by the semi join")
    // semi join never duplicates: multi-order customers count once
    val dupCheck = cust3way(nCust)
    assert(dupCheck == nCust)
  }

  private def cust3way(nCust: Long): Long = {
    import org.apache.spark.sql.functions._
    graft.core.Tables.customer(spark, sf001).select($"c_custkey")
      .join(graft.core.Tables.orders(spark, sf001),
        $"c_custkey" === $"o_custkey", "left_semi")
      .agg(count(lit(1))).as[Long].collect().head
  }
}
