package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The rule is injected by `Sessions.local` (GraftExtensions), so it is
  * live on the shared test session. Reference results are derived from
  * the UNFILTERED window — the rule only matches a rank-1 Filter, so
  * that plan runs the real Window machinery — filtered to rank 1 on the
  * driver.
  */
class ArgmaxRewriteSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = graft.TestSpark.spark

  private def customers: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/customer.parquet")

  /** Window-computed reference: collect ALL ranked rows, keep rank 1. */
  private def windowReference(df: DataFrame): Set[String] =
    df.collect().filter(_.getAs[Int]("rn") == 1).map(_.toString).toSet

  test("rn=1 over asc window rewrites to aggregate and matches the window result") {
    import spark.implicits._
    val w = Window.partitionBy($"c_mktsegment").orderBy($"c_custkey")
    val ranked = customers.withColumn("rn", row_number().over(w))
    val q = ranked.filter($"rn" === 1)
    val plan = q.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Window") && plan.contains("Aggregate"),
      s"expected argmax rewrite:\n$plan")
    assert(ranked.queryExecution.optimizedPlan.toString.contains("Window"),
      "unfiltered window must NOT be rewritten")
    // c_custkey is unique ⇒ the window pick is fully determined: results
    // must be identical row-for-row with the real window machinery
    val got = q.collect().map(_.toString).toSet
    assert(got == windowReference(ranked) && got.nonEmpty)
  }

  test("desc ordering maps to max; rn stays usable downstream as 1") {
    import spark.implicits._
    val w = Window.partitionBy($"c_mktsegment").orderBy($"c_acctbal".desc, $"c_custkey".desc)
    val ranked = customers.withColumn("rn", row_number().over(w))
    val q = ranked.filter($"rn" <= 1).select($"c_mktsegment", $"c_custkey", $"rn")
    val plan = q.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Window"), s"desc top-one should rewrite:\n$plan")
    val got = q.collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val want = ranked.collect().filter(_.getAs[Int]("rn") == 1)
      .map(r => (r.getAs[String]("c_mktsegment"), r.getAs[Long]("c_custkey"), 1)).toSet
    assert(got == want && got.forall(_._3 == 1))
  }

  test("the rewritten plan partial-aggregates (one row per key crosses the shuffle)") {
    import spark.implicits._
    val w = Window.partitionBy($"c_mktsegment").orderBy($"c_custkey")
    val q = customers.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("partial_min") || physical.contains("partial_max"),
      s"argmax must combine map-side:\n$physical")
    assert(!physical.contains("Window"), s"no window exec expected:\n$physical")
  }

  test("no rewrite: rank 2 filters, mixed directions, extra predicates, other window fns") {
    import spark.implicits._
    val w = Window.partitionBy($"c_mktsegment").orderBy($"c_custkey")
    val rank2 = customers.withColumn("rn", row_number().over(w)).filter($"rn" === 2)
    assert(rank2.queryExecution.optimizedPlan.toString.contains("Window"))

    val mixed = Window.partitionBy($"c_mktsegment")
      .orderBy($"c_acctbal".desc, $"c_custkey")
    val mixedQ = customers.withColumn("rn", row_number().over(mixed)).filter($"rn" === 1)
    assert(mixedQ.queryExecution.optimizedPlan.toString.contains("Window"))

    val extra = customers.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1 && $"c_acctbal" > 0)
    assert(extra.queryExecution.optimizedPlan.toString.contains("Window"))

    val rnk = customers.withColumn("r", rank().over(w)).filter($"r" === 1)
    assert(rnk.queryExecution.optimizedPlan.toString.contains("Window"))

    // global (unpartitioned) window: a global aggregate would fabricate
    // one null row on empty input — must NOT rewrite
    val gw = Window.orderBy($"c_custkey")
    val globalQ = customers.filter($"c_custkey" < 0) // empty
      .withColumn("rn", row_number().over(gw)).filter($"rn" === 1)
    assert(globalQ.queryExecution.optimizedPlan.toString.contains("Window") ||
      globalQ.queryExecution.optimizedPlan.toString.contains("Empty"))
    assert(globalQ.count() == 0, "empty input must stay empty")
  }

  test("full-width dedup (the reference idiom) rewrites and keeps exact content") {
    import spark.implicits._
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val keys = li.columns.filterNot(_ == "l_quantity").map(col)
    val w = Window.partitionBy(keys: _*).orderBy($"l_quantity")
    val ranked = li.withColumn("rn", row_number().over(w))
    val q = ranked.filter($"rn" <= 1)
    assert(!q.queryExecution.optimizedPlan.toString.contains("Window"))
    // keys cover every other column, so even quantity ties carry
    // identical rows — content must match the window form exactly
    val got = q.drop("rn").collect().map(_.toString).toSet
    val want = ranked.collect().filter(_.getAs[Int]("rn") == 1)
      .map(r => org.apache.spark.sql.Row.fromSeq(r.toSeq.dropRight(1)).toString).toSet
    assert(got == want && got.nonEmpty)
  }
}
