package graft.operators

class CorrMatrixSpec extends graft.SparkSpec {
  import spark.implicits._

  private val fixture = Seq(
    (1.0, 2.0, 4.0),
    (2.0, 4.0, 3.0),
    (3.0, 6.0, 2.0),
    (4.0, 8.0, 1.0)
  ).toDF("x", "y", "z")

  test("perfectly correlated and anti-correlated pairs hit ±1 (to sqrt rounding)") {
    // sqrt(a)*sqrt(b) lands a ulp off sqrt(ab): ±1 to 1e-12, not ==
    val m = CorrMatrix.corrMatrix(fixture, Seq("x", "y", "z"))
      .as[(String, String, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    assert(math.abs(m(("x", "y")) - 1.0) < 1e-12)
    assert(math.abs(m(("x", "z")) + 1.0) < 1e-12)
    assert(math.abs(m(("y", "z")) + 1.0) < 1e-12)
  }

  test("cells match the a14 single-pair formula bit-for-bit") {
    val orders = graft.core.Tables.orders(spark, sf001)
    val m = CorrMatrix.corrMatrix(orders,
      Seq("o_totalprice", "o_custkey", "o_orderkey"))
      .filter($"col_x" === "o_totalprice" && $"col_y" === "o_custkey")
      .select("corr").as[Double].collect().head
    // same component sums + same IEEE assembly as the a14 gate, up to
    // the matrix's 12-dp ulp guard (added after a measured sf0.1
    // last-ulp divergence vs DuckDB)
    val single = graft.SparkEntry.queries("a14_covariance")(spark, sf001)
      .select("corr").as[Double].collect().head
    assert(m == BigDecimal(single)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("rows with a null in any column are dropped (listwise-complete)") {
    val withNull = Seq(
      (Some(1.0), Some(2.0), Some(4.0)),
      (Some(2.0), Some(4.0), Some(3.0)),
      (Some(3.0), Some(6.0), Some(2.0)),
      (Some(4.0), Some(8.0), Some(1.0)),
      (Some(9.0), None, Some(9.0))
    ).toDF("x", "y", "z")
    val a = CorrMatrix.corrMatrix(withNull, Seq("x", "y", "z"))
      .as[(String, String, Double)].collect().toSet
    val b = CorrMatrix.corrMatrix(fixture, Seq("x", "y", "z"))
      .as[(String, String, Double)].collect().toSet
    assert(a == b)
  }

  test("one aggregation pass: no joins, k*(k+1)/2 product sums in one aggregate") {
    val plan = CorrMatrix.corrMatrix(
      graft.core.Tables.orders(spark, sf001),
      Seq("o_totalprice", "o_custkey", "o_orderkey"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"matrix must not self-join:\n$plan")
    // partial + final of the single wide aggregate; nothing else
    assert("HashAggregate".r.findAllIn(plan).size == 2, plan)
  }
}
