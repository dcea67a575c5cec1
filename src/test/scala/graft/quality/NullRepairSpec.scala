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

  test("N9 exact: discrete median picks the element at rank ceil(n/2)") {
    // even fit count: {312, 345, 355, 355, 387} ∪ … — build explicit
    // fixtures so the rank arithmetic is visible
    val even = Seq(Some(10.0), Some(20.0), Some(30.0), Some(40.0), None)
      .toDF("v")
    // n=4 → rank ceil(4/2)=2 → 20.0 (quantile_disc lower-middle, NOT
    // the interpolated 25.0)
    val filledEven = NullRepair.imputeMedianExact(even, "v")
      .filter($"v" === 20.0).count()
    assert(filledEven == 2L, "null must be filled with 20.0 (rank-2 element)")

    val odd = Seq(Some(1.0), Some(5.0), Some(9.0), None).toDF("v")
    // n=3 → rank 2 → 5.0
    assert(NullRepair.imputeMedianExact(odd, "v")
      .filter($"v".isNull).count() == 0L)
    assert(NullRepair.imputeMedianExact(odd, "v")
      .filter($"v" === 5.0).count() == 2L)
  }

  test("N9 exact: statistic comes from fitOn subset, repair hits full frame") {
    val df = Seq(("keep", Some(100.0)), ("keep", Some(300.0)),
      ("keep", Some(200.0)), ("skip", Some(999.0)), ("skip", None))
      .toDF("grp", "v")
    val repaired = NullRepair.imputeMedianExact(df, "v",
      fitOn = Some(df.filter($"grp" === "keep")))
    // median of {100, 200, 300} = 200 — 999 from the skipped subset
    // must not shift it; the null row lives outside the fit subset and
    // is still repaired
    assert(repaired.filter($"grp" === "skip" && $"v" === 200.0).count() == 1L)
  }

  test("N10: group census percents sum to 1") {
    val census = NullRepair.groupCensus(storeRevenue.na.drop("all"), Seq("Store"))
    val pcts = census.select(sum($"percent")).as[Double].head()
    assert(math.abs(pcts - 1.0) < 1e-9)
  }
}
