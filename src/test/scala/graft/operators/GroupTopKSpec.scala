package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class GroupTopKSpec extends SparkSpec {
  import spark.implicits._

  private def customers = graft.core.Tables.customer(spark, sf0001)

  test("aggregate top-k equals the rank window row-for-row (asc, unique tiebreak)") {
    val viaAgg = GroupTopK.topKPerGroup(customers,
      keys = Seq("c_mktsegment"), sortCols = Seq("c_acctbal", "c_custkey"), k = 3)
      .select($"c_mktsegment", $"rn", $"c_acctbal", $"c_custkey")
    val w = Window.partitionBy($"c_mktsegment").orderBy($"c_acctbal", $"c_custkey")
    val viaWindow = customers.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3) // k>1: the argmax rule leaves this window alone
      .select($"c_mktsegment", $"rn", $"c_acctbal", $"c_custkey")
    val a = viaAgg.collect().map(_.toString).toSet
    val b = viaWindow.collect().map(_.toString).toSet
    assert(a == b && a.nonEmpty)
  }

  test("descending top-k equals the desc rank window") {
    val viaAgg = GroupTopK.topKPerGroup(customers,
      keys = Seq("c_mktsegment"), sortCols = Seq("c_acctbal", "c_custkey"),
      k = 5, descending = true)
      .select($"c_mktsegment", $"rn", $"c_custkey")
    val w = Window.partitionBy($"c_mktsegment")
      .orderBy($"c_acctbal".desc, $"c_custkey".desc)
    val viaWindow = customers.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5).select($"c_mktsegment", $"rn", $"c_custkey")
    assert(viaAgg.collect().map(_.toString).toSet ==
      viaWindow.collect().map(_.toString).toSet)
  }

  test("plans as a partial-combining object aggregate, no window, no sort below the shuffle") {
    val df = GroupTopK.topKPerGroup(customers,
      keys = Seq("c_mktsegment"), sortCols = Seq("c_acctbal", "c_custkey"), k = 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("top_k_structs"), s"custom aggregate missing:\n$plan")
    assert(plan.contains("partial_top_k_structs"), s"no map-side combine:\n$plan")
    assert(!plan.contains("Window"), s"window crept back in:\n$plan")
  }

  test("groups smaller than k yield all their rows; k=1 is argmax") {
    val tiny = Seq(("a", 1, 10), ("a", 2, 20), ("b", 3, 30))
      .toDF("g", "id", "v")
    val out = GroupTopK.topKPerGroup(tiny, Seq("g"), Seq("v", "id"), k = 5)
      .select($"g", $"rn", $"id").as[(String, Int, Int)].collect().toSet
    assert(out == Set(("a", 1, 1), ("a", 2, 2), ("b", 1, 3)))
    val one = GroupTopK.topKPerGroup(tiny, Seq("g"), Seq("v", "id"),
      k = 1, descending = true)
      .select($"g", $"id").as[(String, Int)].collect().toSet
    assert(one == Set(("a", 2), ("b", 3)))
  }
}
