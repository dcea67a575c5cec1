package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Rule is live via Sessions.local (GraftExtensions). References come
  * from the UNFILTERED window (never rewritten), filtered driver-side.
  */
class TopKRewriteSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = graft.TestSpark.spark

  private def customers: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/customer.parquet")

  private def reference(ranked: DataFrame, k: Int): Set[String] =
    ranked.collect().filter(_.getAs[Int]("rn") <= k).map(_.toString).toSet

  test("rn<=3 asc rewrites to top_k_structs + posexplode, matches the window") {
    import spark.implicits._
    val w = Window.partitionBy($"c_mktsegment").orderBy($"c_acctbal", $"c_custkey")
    val ranked = customers.withColumn("rn", row_number().over(w))
    val q = ranked.filter($"rn" <= 3)
    val plan = q.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Window") && plan.contains("top_k_structs"),
      s"expected top-k rewrite:\n$plan")
    assert(q.collect().map(_.toString).toSet == reference(ranked, 3))
  }

  test("rn<4 desc spelling rewrites too; ranks come back as 1..3") {
    import spark.implicits._
    val w = Window.partitionBy($"c_mktsegment")
      .orderBy($"c_acctbal".desc, $"c_custkey".desc)
    val ranked = customers.withColumn("rn", row_number().over(w))
    val q = ranked.filter($"rn" < 4)
    assert(!q.queryExecution.optimizedPlan.toString.contains("Window"))
    assert(q.collect().map(_.toString).toSet == reference(ranked, 3))
    assert(q.select($"rn").distinct().collect().map(_.getInt(0)).sorted.toSeq
      == Seq(1, 2, 3))
  }

  test("physical plan partial-aggregates with no window or full sort") {
    import spark.implicits._
    val w = Window.partitionBy($"c_mktsegment").orderBy($"c_acctbal", $"c_custkey")
    val q = customers.withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("partial_top_k_structs"),
      s"no map-side combine:\n$physical")
    assert(!physical.contains("Window"), s"window exec survived:\n$physical")
  }

  test("no rewrite: k=1 goes to argmax, huge k, mixed direction, equality filter") {
    import spark.implicits._
    val w = Window.partitionBy($"c_mktsegment").orderBy($"c_acctbal", $"c_custkey")
    // k=1: claimed by the cheaper argmax rule (no top_k_structs)
    val k1 = customers.withColumn("rn", row_number().over(w)).filter($"rn" <= 1)
    val k1Plan = k1.queryExecution.optimizedPlan.toString
    assert(!k1Plan.contains("top_k_structs") && !k1Plan.contains("Window"))
    // k beyond the bound stays a window
    val huge = customers.withColumn("rn", row_number().over(w)).filter($"rn" <= 1000)
    assert(huge.queryExecution.optimizedPlan.toString.contains("Window"))
    // mixed direction stays a window (this is o3_group_topk's shape)
    val mixed = Window.partitionBy($"c_mktsegment")
      .orderBy($"c_acctbal".desc, $"c_custkey")
    val mq = customers.withColumn("rn", row_number().over(mixed)).filter($"rn" <= 3)
    assert(mq.queryExecution.optimizedPlan.toString.contains("Window"))
    // rank EQUALITY above 1 selects one stratum, not a top-k — no rewrite
    val eq = customers.withColumn("rn", row_number().over(w)).filter($"rn" === 2)
    assert(eq.queryExecution.optimizedPlan.toString.contains("Window"))
  }
}
