package graft.functions

import graft.transform.Cleansers
import org.apache.spark.sql.functions._

class UdfSurfaceSpec extends graft.SparkSpec {
  import spark.implicits._

  private val samples =
    Seq("10.5%", "7%%", "%", "", "plain", null).map(Tuple1(_))

  test("udf escape hatch matches the native cleanser (incl. null)") {
    val df = samples.toDF("s")
    val got = df.select(Udfs.stripPercentUdf($"s")).as[String].collect().toSeq
    val native = df.select(Cleansers.stripPercent($"s")).as[String].collect().toSeq
    assert(got == native)
  }

  test("SQL-text registration works") {
    Udfs.register(spark)
    samples.toDF("s").createOrReplaceTempView("udf_probe")
    val got = spark.sql("SELECT strip_percent(s) AS r FROM udf_probe")
      .as[String].collect().toSeq
    assert(got == Seq("10.5", "7", "", "", "plain", null))
  }

  test("the documented cost: a UDF blocks pushdown that the native path keeps") {
    val path = s"$sf0001/part.parquet"
    val native = spark.read.parquet(path)
      .filter(length(Cleansers.stripPercent($"p_name")) > 0 && $"p_partkey" > 100)
    val viaUdf = spark.read.parquet(path)
      .filter(length(Udfs.stripPercentUdf($"p_name")) > 0 && $"p_partkey" > 100)
    def pushed(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString
        .linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    // the simple comparison rides to the scan in both; the point is the
    // UDF itself never pushes, while the native expression tree is
    // transparent to the optimizer
    assert(pushed(native).contains("p_partkey"))
    assert(pushed(viaUdf).contains("p_partkey"))
    assert(viaUdf.queryExecution.executedPlan.toString.contains("UDF"),
      "expected the UDF to appear as an opaque call in the plan")
    assert(!native.queryExecution.executedPlan.toString.contains("UDF"))
  }
}
