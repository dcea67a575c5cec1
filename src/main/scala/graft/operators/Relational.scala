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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _)
  )

  def oracle: Map[String, String] = Map(
    "q1_agg" -> q1AggSql
  )
}
