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
}
