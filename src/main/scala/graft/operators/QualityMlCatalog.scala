package graft.operators

import graft.core.Tables
import graft.ml.{CombinationSearch, ConfusionMatrix, FeaturePipeline}
import graft.quality.Validator
import graft.transform.Cleansers
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Validator-audit and ML-pipeline queries (SURVEY.md §3.2 validator
  * loop, §3.3 ML branch). The ML query is gated rows-only: MLPC weights
  * depend on data partitioning, so no cross-engine oracle exists — the
  * ScalaTest suite asserts the learning behavior instead.
  */
object QualityMlCatalog {

  /** Loan-like percent-string audit built deterministically from part:
    * every 100th part gets an unparseable rate (the full LendingClub
    * file has exactly one invalid int_rate, FIXTURES.md A3).
    */
  private def rates(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, sfDir).select(
      $"p_partkey",
      when($"p_partkey" % 100 === 0, lit("N/A"))
        .otherwise(concat($"p_retailprice".cast("string"), lit("%")))
        .as("rate_str"))
  }

  /** The shared loan-like percent rule (Validator.repair applies the
    * validity guard itself — the pattern is stated once).
    */
  val rateRule: Validator.ValidationRule = Validator.ValidationRule(
    column = "rate_str", flagCol = "rate_flag",
    pattern = "^[0-9]+(\\.[0-9]+)?%$",
    repair = Cleansers.percentToDouble(col("rate_str")))

  /** Shared loan-like classification frame (entry point C analogue). */
  def loanLike(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .join(broadcast(Tables.customer(spark, sfDir)), $"o_custkey" === $"c_custkey")
      .filter($"o_orderstatus".isin("F", "O"))
      .select($"o_orderstatus".as("status"), $"o_orderpriority", $"c_mktsegment",
        $"o_totalprice", $"c_acctbal",
        // order age is the one signal that actually predicts status
        year($"o_orderdate").cast("double").as("order_year"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // validator census before repair (one invalid class per 100 keys)
    "v4_validator_census" -> ((spark, dir) =>
      Validator.census(rates(spark, dir), Seq(rateRule))
        .orderBy(col("col_name"), col("flag"))),

    // repair + isNotNull filter; oracle derives expected values
    // independently from the source column (never through our parser)
    "v5_validator_repair" -> ((spark, dir) =>
      Validator.repair(rates(spark, dir), Seq(rateRule))
        .filter(col("rate_str").isNotNull)
        .select(col("p_partkey"), col("rate_str").as("rate"))
        .orderBy(col("p_partkey"))),

    // ML: rebalance → seeded split → feature pipeline → MLPC →
    // distributed confusion cells (rows-only gate)
    "ml1_confusion" -> ((spark, dir) => {
      // min-max normalize the continuous block (C9), like the reference
      // does before MLPC training
      val df = Cleansers.minMaxNormalize(loanLike(spark, dir),
        Seq("o_totalprice", "c_acctbal", "order_year"))
      val balanced = FeaturePipeline.rebalance(df, "status", "F", 0.5, 42L)
      val Array(train, test) = balanced.randomSplit(Array(0.8, 0.2), 42L)
      val cfg = FeaturePipeline.Config(
        labelCol = "status",
        categoricalCols = Seq("o_orderpriority", "c_mktsegment"),
        continuousCols = Seq("o_totalprice_norm", "c_acctbal_norm", "order_year_norm"),
        buckets = Map("c_acctbal" -> Array(Double.NegativeInfinity, 0.0, 2500.0,
          5000.0, 7500.0, Double.PositiveInfinity)),
        hiddenLayers = Seq(5), numClasses = 3, maxIter = 25)
      val model = FeaturePipeline.fit(train.cache(), cfg)
      val scored = CombinationSearch.scoreWithLabels(model, test)
      ConfusionMatrix.cells(scored, "status", "prediction_label")
    })
  )

  def oracle: Map[String, String] = Map(
    "v4_validator_census" ->
      """SELECT 'rate_str' AS col_name,
        |  CASE WHEN p_partkey % 100 = 0 THEN 'invalid' ELSE 'valid' END AS flag,
        |  COUNT(*) AS cnt
        |FROM part GROUP BY 1, 2 ORDER BY col_name, flag""".stripMargin,

    "v5_validator_repair" ->
      """SELECT p_partkey, p_retailprice AS rate FROM part
        |WHERE p_partkey % 100 <> 0 ORDER BY p_partkey""".stripMargin
    // ml1_confusion: rows-only (no cross-engine oracle for MLPC weights)
  )
}
