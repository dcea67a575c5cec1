package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {

  // the rule is installed on the SHARED session — remove it after this
  // suite so later suites don't run under it (order-dependence)
  override def afterAll(): Unit = {
    graft.TestSpark.spark.experimental.extraOptimizations = Nil
  }

  // getOrCreate ignores withExtensions once any session exists (suite
  // ordering), so register the rule on the shared session via
  // experimental.extraOptimizations — same injection point semantics
  // (post-optimizer batch), production uses GraftExtensions/
  // spark.sql.extensions
  private lazy val spark: SparkSession = {
    val s = graft.TestSpark.spark
    s.experimental.extraOptimizations = Seq(UnionFilterToIsin)
    s
  }

  test("filter-union on the same child rewrites to a single isin filter") {
    import spark.implicits._
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select($"o_orderkey", $"o_orderstatus")
    val unioned = o.filter($"o_orderstatus" === "F")
      .union(o.filter($"o_orderstatus" === "O"))
    val optimized = unioned.queryExecution.optimizedPlan
    assert(!optimized.toString.contains("Union"),
      s"Union should be rewritten:\n$optimized")
    assert(optimized.toString.contains(" IN "), s"expected isin:\n$optimized")
    // semantics: same multiset as the un-rewritten form
    val expected = o.filter($"o_orderstatus".isin("F", "O"))
      .groupBy($"o_orderstatus").count().as[(String, Long)].collect().toMap
    val got = unioned.groupBy($"o_orderstatus").count().as[(String, Long)].collect().toMap
    assert(got == expected)
  }

  test("dot_product is SQL-callable when extensions are installed") {
    // injectFunction path needs a built-with-extensions session; the
    // registry API is the same, so register directly here
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product",
      exprs => graft.functions.DotProduct(exprs(0), exprs(1)),
      "built-in")
    val r = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head()
    assert(r.getDouble(0) == 11.0)
  }

  test("no rewrite when the filter sits below an aggregate or limit (row-merging ops)") {
    import spark.implicits._
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    // filter → groupBy → union: merging these would sum counts across
    // branches (confirmed wrong before the fix) — Union must survive
    val aggUnion = o.filter($"o_orderpriority" === "1-URGENT")
      .groupBy($"o_orderstatus").count()
      .union(o.filter($"o_orderpriority" === "2-HIGH")
        .groupBy($"o_orderstatus").count())
    assert(aggUnion.queryExecution.optimizedPlan.toString.contains("Union"))
    assert(aggUnion.count() ==
      o.filter($"o_orderpriority" === "1-URGENT").select($"o_orderstatus").distinct().count() +
        o.filter($"o_orderpriority" === "2-HIGH").select($"o_orderstatus").distinct().count())
    // filter → limit → union: halving rows would be wrong
    val limUnion = o.filter($"o_orderstatus" === "F").limit(5)
      .union(o.filter($"o_orderstatus" === "O").limit(5))
    assert(limUnion.queryExecution.optimizedPlan.toString.contains("Union"))
    assert(limUnion.count() == 10)
  }

  test("rewrite still found when branches differ only in a LATER equality predicate") {
    import spark.implicits._
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select($"o_orderkey", $"o_orderstatus", $"o_orderpriority")
    // c1=x AND c2=a  UNION  c1=x AND c2=b — the unifying pair is the
    // SECOND equality; a first-predicate-only analyze misses it
    val unioned = o
      .filter($"o_orderpriority" === "1-URGENT" && $"o_orderstatus" === "F")
      .union(o.filter($"o_orderpriority" === "1-URGENT" && $"o_orderstatus" === "O"))
    val optimized = unioned.queryExecution.optimizedPlan
    assert(!optimized.toString.contains("Union"),
      s"Union should be rewritten on the second equality:\n$optimized")
    val expected = o.filter($"o_orderpriority" === "1-URGENT" &&
      $"o_orderstatus".isin("F", "O")).count()
    assert(unioned.count() == expected)
  }

  test("three-branch chained union rewrites to one isin of all three literals") {
    import spark.implicits._
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select($"o_orderkey", $"o_orderpriority")
    val unioned = o.filter($"o_orderpriority" === "1-URGENT")
      .union(o.filter($"o_orderpriority" === "2-HIGH"))
      .union(o.filter($"o_orderpriority" === "5-LOW"))
    val optimized = unioned.queryExecution.optimizedPlan
    assert(!optimized.toString.contains("Union"),
      s"flattened 3-branch union should rewrite:\n$optimized")
    val expected = o.filter($"o_orderpriority"
      .isin("1-URGENT", "2-HIGH", "5-LOW")).count()
    assert(unioned.count() == expected)
    // but a repeated literal anywhere forbids it (bag duplicates)
    val dup3 = o.filter($"o_orderpriority" === "1-URGENT")
      .union(o.filter($"o_orderpriority" === "2-HIGH"))
      .union(o.filter($"o_orderpriority" === "1-URGENT"))
    assert(dup3.queryExecution.optimizedPlan.toString.contains("Union"))
    assert(dup3.count() ==
      2 * o.filter($"o_orderpriority" === "1-URGENT").count() +
        o.filter($"o_orderpriority" === "2-HIGH").count())
  }

  test("no rewrite when literals are distinct objects but SQL-equal (-0.0 vs 0.0 doubles)") {
    import spark.implicits._
    // -0.0 == 0.0 under SQL comparison: each branch matches BOTH zero
    // rows, so the union emits 4 rows; an isin rewrite would emit 2.
    // Literal(-0.0) != Literal(0.0) as objects — only EqualTo-eval
    // exclusivity catches this.
    // parquet roundtrip: filters over a LocalRelation are folded away
    // before this (post-optimizer) rule ever sees them
    val dir = java.nio.file.Files.createTempDirectory("zeros").toString
    Seq(0.0, -0.0, 1.0).toDF("v").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val unioned = df.filter($"v" === -0.0).union(df.filter($"v" === 0.0))
    assert(unioned.queryExecution.optimizedPlan.toString.contains("Union"),
      s"SQL-equal literals must NOT rewrite:\n${unioned.queryExecution.optimizedPlan}")
    assert(unioned.count() == 4)
    // sanity: genuinely distinct doubles on the same child still rewrite
    val ok = df.filter($"v" === 0.0).union(df.filter($"v" === 1.0))
    assert(!ok.queryExecution.optimizedPlan.toString.contains("Union"))
    assert(ok.count() == 3)
  }

  test("no rewrite when literals are equal (bag union duplicates rows) or children differ") {
    import spark.implicits._
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select($"o_orderkey", $"o_orderstatus")
    // equal literals: union keeps duplicates, isin would dedup — must NOT rewrite
    val dup = o.filter($"o_orderstatus" === "F").union(o.filter($"o_orderstatus" === "F"))
    assert(dup.queryExecution.optimizedPlan.toString.contains("Union"))
    assert(dup.count() == 2 * o.filter($"o_orderstatus" === "F").count())
    // different children: must NOT rewrite
    val o2 = o.limit(10)
    val mixed = o.filter($"o_orderstatus" === "F").union(o2.filter($"o_orderstatus" === "O"))
    assert(mixed.queryExecution.optimizedPlan.toString.contains("Union"))
  }
}
