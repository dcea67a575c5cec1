package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Golden facts from the reference's store_revenue fixture
  * (FIXTURES.md A1; Null Detection and Null Replacement.ipynb cells 1–14).
  */
class NullRepairSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("Store", StringType), StructField("WeekInMonth", LongType),
    StructField("Revenue", LongType)))

  private def storeRevenue = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      Row("Store 1", 1L, 448L), Row("Store 1", 2L, null),
      Row("Store 1", 3L, 499L), Row("Store 1", 44L, 432L),
      Row(null, null, null), Row("Store 2", 1L, 355L),
      Row("Store 2", 1L, 355L), Row("Store 2", null, 345L),
      Row("Store 2", 3L, 387L), Row("Store 2", 4L, 312L))), schema)

  test("N1: null census is Store:1, WeekInMonth:2, Revenue:2") {
    val census = NullRepair.nullCensus(storeRevenue).head()
    assert(census.getLong(0) == 1 && census.getLong(1) == 2 && census.getLong(2) == 2)
  }

  test("N2: three rows contain at least one null") {
    assert(NullRepair.rowsWithAnyNull(storeRevenue).count() == 3)
  }

  test("N3/N4/N5: drop policies match reference outputs") {
    assert(NullRepair.dropNulls(storeRevenue, "any").count() == 7)
    assert(NullRepair.dropNulls(storeRevenue, "all").count() == 9)
    assert(NullRepair.dropNulls(storeRevenue, "any", Seq("Store", "WeekInMonth")).count() == 8)
  }

  test("N6/N7: constant fills") {
    val filled = NullRepair.fill(storeRevenue,
      Map("Store" -> "Assume_Store 1", "WeekInMonth" -> 2L, "Revenue" -> 3L))
    assert(NullRepair.rowsWithAnyNull(filled).count() == 0)
    assert(filled.filter($"Store" === "Assume_Store 1").count() == 1)
  }

  test("N8: mean imputation uses the non-null mean (391.625)") {
    val df = storeRevenue.withColumn("Revenue", $"Revenue".cast(DoubleType))
    val imputed = NullRepair.imputeMean(df, Seq("Revenue"))
    assert(imputed.filter($"Revenue".isNull).count() == 0)
    val injected = imputed.join(df.filter($"Revenue".isNull), Seq("Store", "WeekInMonth"))
    // rows that were null now carry the mean of the 8 non-null values
    val vals = injected.select(imputed("Revenue")).as[Double].collect()
    assert(vals.nonEmpty && vals.forall(v => math.abs(v - 391.625) < 1e-9))
  }

  test("N9: median imputation fit on the Store 1 subset fills with 448") {
    val df = storeRevenue.withColumn("Revenue", $"Revenue".cast(DoubleType))
    val imputed = NullRepair.imputeMedian(df, Seq("Revenue"),
      fitOn = Some(df.filter($"Store" === "Store 1")))
    // golden from FIXTURES.md A1: median of Store 1's {448, 499, 432} = 448
    val filled = imputed.join(df.filter($"Revenue".isNull), Seq("Store", "WeekInMonth"))
      .select(imputed("Revenue")).as[Double].collect()
    assert(filled.nonEmpty && filled.forall(_ == 448.0))
  }

  test("N10: group census percents sum to 1") {
    val census = NullRepair.groupCensus(storeRevenue.na.drop("all"), Seq("Store"))
    val pcts = census.select(sum($"percent")).as[Double].head()
    assert(math.abs(pcts - 1.0) < 1e-9)
  }
}
