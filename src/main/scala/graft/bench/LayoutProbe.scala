package graft.bench

import graft.core.Tables
import graft.sources.Layout
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Layout rehearsal (dev tool): measure what the write-side layouts
  * actually buy a selective scan — the DESIGN.md "Output layout"
  * numbers come from here. Methodology mirrors ScaleProbe: multiply
  * sf0.1 orders to make scan time measurable, write each layout once,
  * then time identical filtered counts (best of 3) against each copy.
  */
object LayoutProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_COPIES", "16").toInt
    val spark = graft.core.Sessions.local()
    def time(name: String)(f: => Long): Unit =
      ProbeUtil.time("layout", name, repeats = 3)(f)

    val base = graft.core.Staging.tmpDir("layout_probe")
    val orders = ProbeUtil.multiply(Tables.orders(spark, sfDir),
        "o_orderkey", copies, 1000000000L)
      .withColumn("o_year", year(col("o_orderdate")))
    println(s"--- ${orders.count()} rows, layouts under $base")

    orders.write.mode("overwrite").parquet(s"$base/plain")
    Layout.compactedPartitionedParquet(orders, s"$base/byyear", Seq("o_year"))
    Layout.zOrderClusteredParquet(orders, s"$base/zorder",
      Seq("o_custkey", "o_totalprice"), files = 64)
    Layout.rangeClusteredParquet(orders, s"$base/byprice", "o_totalprice", files = 64)

    val plain = spark.read.parquet(s"$base/plain")
    val byYear = spark.read.parquet(s"$base/byyear")
    val z = spark.read.parquet(s"$base/zorder")
    val byPrice = spark.read.parquet(s"$base/byprice")

    time("year filter / plain")(plain.filter(col("o_year") === 1997).count())
    time("year filter / partitioned")(byYear.filter(col("o_year") === 1997).count())

    val box = (d: DataFrame) => d.filter(col("o_custkey") <= 300 &&
      col("o_totalprice") <= 150000.0).count()
    time("2-D box / plain")(box(plain))
    time("2-D box / z-ordered")(box(z))

    val range = (d: DataFrame) =>
      d.filter(col("o_totalprice") >= 100000.0 && col("o_totalprice") < 110000.0).count()
    time("price range / plain")(range(plain))
    time("price range / range-clustered")(range(byPrice))
    spark.stop()
  }
}
