package graft.operators

class OutliersSpec extends graft.SparkSpec {
  import spark.implicits._

  private def df(vals: Seq[java.lang.Double]) =
    vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")

  test("discrete quartiles follow the ANSI ceil(q*n) rank (DuckDB quantile_disc)") {
    // n=7: q1 rank ceil(1.75)=2, q3 rank ceil(5.25)=6
    val b = Outliers.iqrBounds(df((1 to 7).map(d => Double.box(d.toDouble))), "v", 1.5)
      .as[(Double, Double, Double, Double)].collect().head
    assert(b == ((2.0, 6.0, 2.0 - 1.5 * 4.0, 6.0 + 1.5 * 4.0)))
  }

  test("tukey fences flag the planted extreme and only it") {
    val vals = ((1 to 7).map(d => Double.box(d.toDouble)) :+ Double.box(100.0))
    // n=8: q1 = 2, q3 = 6, iqr = 4 → fences [-4, 12]
    val out = Outliers.iqrOutliers(df(vals), "v", 1.5)
      .select("v").as[Double].collect().toSeq
    assert(out == Seq(100.0))
  }

  test("filter keeps nulls and inner rows; outliers+filter partition the frame") {
    val vals = Seq[java.lang.Double](1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 100.0, null)
    val d = df(vals)
    val keep = Outliers.iqrFilter(d, "v", 1.5).select("id").as[Long].collect().toSet
    val out = Outliers.iqrOutliers(d, "v", 1.5).select("id").as[Long].collect().toSet
    assert(keep.intersect(out).isEmpty)
    assert(keep.union(out) == (0L until 9L).toSet)
    assert(keep.contains(8L), "null row stays (repair is a separate pass)")
  }

  test("approx path: fences equal the exact path's on a clean fixture") {
    // distinct values, modest n: the sketch's rank error is zero, so
    // the approximate quartiles pick the same DATA VALUES as the exact
    // rank statistic and the fences coincide bit-for-bit
    val d = df((1 to 101).map(d => Double.box(d.toDouble)))
    val exact = Outliers.iqrBounds(d, "v", 1.5)
      .as[(Double, Double, Double, Double)].collect().head
    val approx = Outliers.iqrBoundsApprox(d, "v", 1.5)
      .as[(Double, Double, Double, Double)].collect().head
    assert(approx == exact, s"approx $approx vs exact $exact")
  }

  test("approx path flags the same planted extreme") {
    val vals = ((1 to 7).map(d => Double.box(d.toDouble)) :+ Double.box(100.0))
    val out = Outliers.iqrOutliersApprox(df(vals), "v", 1.5)
      .select("v").as[Double].collect().toSeq
    assert(out == Seq(100.0))
  }

  test("approx path has no window and no global sort in the plan") {
    val plan = Outliers.iqrOutliersApprox(
      graft.core.Tables.events(spark, sf001).select($"event_id", $"value"),
      "value", 1.5).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("bounds broadcast back — no sort-merge join in the plan") {
    val plan = Outliers.iqrOutliers(
      graft.core.Tables.events(spark, sf001).select($"event_id", $"value"),
      "value", 1.5).queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("winsorize clips to the exact rank percentiles, goldens") {
    // 1..100: rank ceil(5·100/100)=5 → lo=5, rank ceil(95·100/100)=95 → hi=95
    val df100 = (1 to 100).map(_.toDouble).toDF("v")
    val out = Outliers.winsorize(df100, "v", 5, 95)
      .select("v", "v_winsor").as[(Double, Double)].collect().toMap
    assert(out(1.0) == 5.0 && out(4.0) == 5.0 && out(5.0) == 5.0)
    assert(out(50.0) == 50.0)
    assert(out(95.0) == 95.0 && out(96.0) == 95.0 && out(100.0) == 95.0)
  }

  test("winsorize: nulls pass through unclipped") {
    val df = Seq(Option(1.0), Option(50.0), Option.empty[Double], Option(99.0))
      .toDF("v")
    val out = Outliers.winsorize(df, "v", 25, 75)
      .select("v_winsor").as[Option[Double]].collect()
    assert(out.count(_.isEmpty) == 1)
  }

  test("winsorizeApprox bounds sit within a few order statistics of exact") {
    // percentile_approx picks an approximate-RANK data value under a
    // slightly different rank convention than ceil(q·n), so each clip
    // bound can land on a NEIGHBORING order statistic — and a one-rank
    // bound shift relabels every clipped row, so row-count agreement is
    // the wrong contract. The sketch's guarantee is rank proximity of
    // the BOUNDS; assert that.
    val ev = graft.core.Tables.events(spark, sf001)
      .select($"event_id", $"value")
    def bounds(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val c = df.select(org.apache.spark.sql.functions.min($"value_winsor"),
          org.apache.spark.sql.functions.max($"value_winsor"))
        .as[(Double, Double)].head()
      c
    }
    val sorted = ev.filter($"value".isNotNull)
      .select($"value").as[Double].collect().sorted
    val (exLo, exHi) = bounds(Outliers.winsorize(ev, "value", 5, 95))
    val (apLo, apHi) = bounds(Outliers.winsorizeApprox(ev, "value", 5, 95))
    def rank(v: Double): Int = sorted.indexWhere(_ == v)
    assert(math.abs(rank(apLo) - rank(exLo)) <= 3,
      s"lo ranks: exact ${rank(exLo)} approx ${rank(apLo)}")
    assert(math.abs(rank(apHi) - rank(exHi)) <= 3,
      s"hi ranks: exact ${rank(exHi)} approx ${rank(apHi)}")
  }

  test("winsorize guards the percentile order") {
    intercept[IllegalArgumentException] {
      Outliers.winsorize(Seq(1.0).toDF("v"), "v", 95, 5)
    }
  }
}
