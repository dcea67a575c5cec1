package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PivotsSpec extends SparkSpec {

  test("discovered columns are the sorted distinct values; cells match explicit pivot") {
    import spark.implicits._
    val df = graft.core.Tables.orders(spark, sf0001)
    val dyn = Pivots.dynamicPivot(df, Seq("o_orderpriority"), "o_orderstatus",
      sum(col("o_totalprice")))
    val statuses = df.select($"o_orderstatus").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    assert(dyn.columns.toSeq == ("o_orderpriority" +: statuses))
    val explicit = df.groupBy($"o_orderpriority")
      .pivot("o_orderstatus", statuses).agg(sum($"o_totalprice"))
    assert(dyn.orderBy($"o_orderpriority").collect().toSeq ==
      explicit.orderBy($"o_orderpriority").collect().toSeq)
  }

  test("cardinality cap fails fast instead of building a wide schema") {
    import spark.implicits._
    val df = graft.core.Tables.customer(spark, sf0001)
    intercept[IllegalArgumentException] {
      Pivots.dynamicPivot(df, Seq("c_nationkey"), "c_name",
        count(lit(1)), maxValues = 10)
    }
  }
}
