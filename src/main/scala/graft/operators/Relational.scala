package graft.operators

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational operators (SURVEY.md §2.1–§2.9) re-expressed as
  * declarative DataFrame plans over the fixture tables. Every entry
  * ships with a DuckDB oracle in [[Relational.oracle]].
  */
object Relational {
  import Exact._

  /** A1/A2/A4/A5 — grouped aggregation with exact sums/averages.
    * Reference analogue: the dup-profile / status-census aggregations
    * (SURVEY §2.5; e.g. `groupBy('loan_status').count()` at
    * LAB-2022-Standalone-SparkML-CSV-to-MLPCModel-3.ipynb:1744).
    * Scale notes: map-side partial agg + AQE; single shuffle on the
    * two low-cardinality group keys.
    */
  def q1Agg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        dsumDisc($"l_extendedprice", $"l_discount").as("sum_disc_price"),
        davg($"l_quantity").as("avg_qty"),
        davg($"l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1AggSql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sqlDsum("l_quantity")} AS sum_qty,
       |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
       |  ${sqlDsumDisc("l_extendedprice", "l_discount")} AS sum_disc_price,
       |  ${sqlDavg("l_quantity")} AS avg_qty,
       |  ${sqlDavg("l_discount")} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Q3-shape (shipping-priority): segment-filtered customer ⋈ orders
    * ⋈ lineitem, date-banded both sides, top-10 orders by decimal-
    * exact revenue. Scale notes: the segment + date filters push to
    * the scans; customer (small side, further ⅕-filtered) broadcasts
    * under the join into orders; orders⋈lineitem is the one real
    * shuffle, keyed on orderkey whose cardinality grows with data;
    * the top-10 is TakeOrderedAndProject above the partial-combined
    * agg — 10 rows per partition cross the wire, never the rank table.
    */
  def q3Top(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cutoff = to_timestamp(lit("1998-01-01"))
    Tables.customer(spark, sfDir).filter($"c_mktsegment" === "BUILDING")
      .join(Tables.orders(spark, sfDir), $"c_custkey" === $"o_custkey")
      .filter($"o_orderdate" < cutoff)
      .join(Tables.lineitem(spark, sfDir), $"l_orderkey" === $"o_orderkey")
      .filter($"l_shipdate" > cutoff)
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(dsumDisc($"l_extendedprice", $"l_discount").as("revenue"))
      .orderBy($"revenue".desc, $"o_orderdate", $"l_orderkey")
      .limit(10)
  }

  /** Q5-shape (local-supplier revenue): six-table join where customer
    * and supplier must share the nation, revenue per nation of one
    * region. Scale notes: region→nation prunes to a ¼-sized broadcast
    * dimension chain; lineitem⋈orders⋈customer shuffle on their
    * growing keys; the co-location predicate (s_nationkey =
    * c_nationkey) rides the supplier join; one low-cardinality final
    * agg.
    */
  def q5Region(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nations = Tables.nation(spark, sfDir)
      .join(Tables.region(spark, sfDir).filter($"r_name" === "ASIA"),
        $"n_regionkey" === $"r_regionkey")
    Tables.customer(spark, sfDir)
      .join(broadcast(nations), $"c_nationkey" === $"n_nationkey")
      .join(Tables.orders(spark, sfDir), $"o_custkey" === $"c_custkey")
      .join(Tables.lineitem(spark, sfDir), $"l_orderkey" === $"o_orderkey")
      .join(Tables.supplier(spark, sfDir),
        $"s_suppkey" === $"l_suppkey" && $"s_nationkey" === $"c_nationkey")
      .groupBy($"n_name")
      .agg(dsumDisc($"l_extendedprice", $"l_discount").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"revenue".desc, $"n_name")
  }

  /** Q10-shape (returned-item ranking): which customers returned the
    * most revenue. Scale notes: the returnflag filter pushes to the
    * lineitem scan (the big table shrinks FIRST); per-customer agg
    * partial-combines; top-20 is TakeOrderedAndProject.
    */
  def q10Returns(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir).filter($"l_returnflag" === "R")
      .join(Tables.orders(spark, sfDir), $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, sfDir), $"o_custkey" === $"c_custkey")
      .groupBy($"c_custkey", $"c_name", $"c_mktsegment")
      .agg(dsumDisc($"l_extendedprice", $"l_discount").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  /** Q18-shape (large-volume customers): orders whose total lineitem
    * quantity clears a threshold, enriched with their customer. Scale
    * notes: the HAVING pre-aggregation shrinks the big table FIRST —
    * one orderkey-keyed partial-combined agg over lineitem, filtered
    * to the few qualifying keys, and only THOSE re-join orders and
    * customer (a semi-join shape Spark plans as broadcast once the
    * survivor set is small; the full 3-way join never materializes
    * unfiltered). Top-100 is TakeOrderedAndProject.
    */
  def q18BigOrders(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val big = Tables.lineitem(spark, sfDir)
      .groupBy($"l_orderkey")
      .agg(dsum($"l_quantity").as("sum_qty"))
      .filter($"sum_qty" > 250.0)
    big.join(Tables.orders(spark, sfDir), $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, sfDir), $"o_custkey" === $"c_custkey")
      .select($"c_name", $"c_custkey", $"o_orderkey", $"o_orderdate",
        $"o_totalprice", $"sum_qty")
      .orderBy($"o_totalprice".desc, $"o_orderdate", $"o_orderkey")
      .limit(100)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _),
    "q3_top_orders" -> (q3Top _),
    "q5_region_revenue" -> (q5Region _),
    "q10_returned" -> (q10Returns _),
    "q18_big_orders" -> (q18BigOrders _)
  )

  def oracle: Map[String, String] = Map(
    "q1_agg" -> q1AggSql,

    "q3_top_orders" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         |  ${sqlDsumDisc("l_extendedprice", "l_discount")} AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |  AND l_shipdate > TIMESTAMP '1998-01-01'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, o_orderdate, l_orderkey
         |LIMIT 10""".stripMargin,

    "q5_region_revenue" ->
      s"""SELECT n_name,
         |  ${sqlDsumDisc("l_extendedprice", "l_discount")} AS revenue,
         |  COUNT(*) AS n_items
         |FROM region
         |JOIN nation ON n_regionkey = r_regionkey
         |JOIN customer ON c_nationkey = n_nationkey
         |JOIN orders ON o_custkey = c_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
         |WHERE r_name = 'ASIA'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin,

    "q10_returned" ->
      s"""SELECT c_custkey, c_name, c_mktsegment,
         |  ${sqlDsumDisc("l_extendedprice", "l_discount")} AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE l_returnflag = 'R'
         |GROUP BY c_custkey, c_name, c_mktsegment
         |ORDER BY revenue DESC, c_custkey
         |LIMIT 20""".stripMargin,

    "q18_big_orders" ->
      s"""WITH big AS (
         |  SELECT l_orderkey, ${sqlDsum("l_quantity")} AS sum_qty
         |  FROM lineitem GROUP BY l_orderkey
         |  HAVING ${sqlDsum("l_quantity")} > 250.0)
         |SELECT c_name, c_custkey, o_orderkey, o_orderdate,
         |  o_totalprice, sum_qty
         |FROM big
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
         |LIMIT 100""".stripMargin
  )
}
