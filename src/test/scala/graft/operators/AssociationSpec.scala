package graft.operators

import org.apache.spark.sql.Row

class AssociationSpec extends graft.SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Option[String], Option[String])]): Row =
    Association.categoricalAssociation(rows.toDF("x", "y"), "x", "y")
      .collect().head

  test("perfect independence: MI = 0, V = 0") {
    // uniform 2x2 crossing, every cell n_xy = n_x·n_y/N exactly
    val rows = for (x <- Seq("a", "b"); y <- Seq("u", "v"); _ <- 1 to 5)
      yield (Option(x), Option(y))
    val r = run(rows)
    assert(r.getAs[Long]("n") == 20)
    assert(r.getAs[Double]("mi") == 0.0)
    assert(r.getAs[Double]("chi2") == 0.0)
    assert(r.getAs[Double]("cramers_v") == 0.0)
  }

  test("perfect dependence: MI = ln(k), V = 1") {
    // y determined by x, k=3 uniform categories
    val rows = for (x <- Seq("a", "b", "c"); _ <- 1 to 4)
      yield (Option(x), Option(x.toUpperCase))
    val r = run(rows)
    val lnK = math.log(3.0)
    assert(math.abs(r.getAs[Double]("mi") - lnK) < 1e-5,
      s"mi ${r.getAs[Double]("mi")} vs ln 3 = $lnK")
    assert(r.getAs[Double]("cramers_v") == 1.0)
  }

  test("nulls are excluded listwise") {
    val rows: Seq[(Option[String], Option[String])] =
      Seq((Option("a"), Option("u")), (Option("a"), Option.empty),
        (Option.empty, Option("u")), (Option("b"), Option("v")))
    val r = run(rows)
    assert(r.getAs[Long]("n") == 2)
    assert(r.getAs[Int]("x_cats") == 2 && r.getAs[Int]("y_cats") == 2)
  }

  test("asymmetric dependence sits strictly between the extremes") {
    // y follows x 3 times out of 4
    val rows = for (x <- Seq("a", "b"); i <- 1 to 8)
      yield (Option(x), Option(if (i <= 6) x.toUpperCase else "Z"))
    val r = run(rows)
    val mi = r.getAs[Double]("mi")
    val v = r.getAs[Double]("cramers_v")
    assert(mi > 0.0 && mi < math.log(2.0))
    assert(v > 0.0 && v < 1.0)
  }

  test("eta squared: group means identical -> 0; groups fully separated -> 1") {
    val same = (Seq.fill(4)(("a", 5L)) ++ Seq.fill(4)(("b", 5L)))
      .toDF("g", "x")
    // zero variance overall: SS_total = 0, eta undefined -> null
    val r0 = Association.etaSquared(same, "g", "x").collect().head
    assert(r0.isNullAt(r0.fieldIndex("eta_sq")))
    val balanced = Seq(("a", 1L), ("a", 9L), ("b", 1L), ("b", 9L)).toDF("g", "x")
    val rb = Association.etaSquared(balanced, "g", "x").collect().head
    assert(rb.getAs[Double]("eta_sq") == 0.0)
    val separated = Seq(("a", 1L), ("a", 1L), ("b", 9L), ("b", 9L)).toDF("g", "x")
    val rs = Association.etaSquared(separated, "g", "x").collect().head
    assert(rs.getAs[Double]("eta_sq") == 1.0)
    assert(rs.getAs[Long]("n") == 4 && rs.getAs[Int]("n_groups") == 2)
  }

  test("eta squared matches the hand-computed ANOVA ratio") {
    // groups a={2,4}, b={8,10}: mean 6, SS_total=40, SS_between=36
    val df = Seq(("a", 2L), ("a", 4L), ("b", 8L), ("b", 10L)).toDF("g", "x")
    val r = Association.etaSquared(df, "g", "x").collect().head
    assert(math.abs(r.getAs[Double]("eta_sq") - 0.9) < 1e-6)
  }

  test("eta squared exact flag reports the S_g^2 < 2^53 regime") {
    // small sums: firmly inside the exact-rational bound
    val small = Seq(("a", 2L), ("a", 4L), ("b", 8L), ("b", 10L)).toDF("g", "x")
    assert(Association.etaSquared(small, "g", "x")
      .collect().head.getAs[Boolean]("exact"))
    // one group's |sum| crosses floor(sqrt(2^53)) = 94906265: the
    // result is still deterministic, but the exactness claim must drop
    val big = Seq(("a", 94906265L), ("a", 1L), ("b", 8L), ("b", 10L))
      .toDF("g", "x")
    assert(!Association.etaSquared(big, "g", "x")
      .collect().head.getAs[Boolean]("exact"))
    // boundary itself still qualifies
    val edge = Seq(("a", 94906265L), ("b", 8L), ("b", 10L)).toDF("g", "x")
    assert(Association.etaSquared(edge, "g", "x")
      .collect().head.getAs[Boolean]("exact"))
  }
}
