package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RobustScaleSpec extends SparkSpec {

  private def toy = {
    import spark.implicits._
    // group g: values 1..4 → ranks 1..4, p25=ceil(1)=1.0, med=ceil(2)=2.0,
    // p75=ceil(3)=3.0; group h: constant → IQR 0 → null scaled
    Seq(("g", 1L, 1.0), ("g", 2L, 2.0), ("g", 3L, 3.0), ("g", 4L, 4.0),
      ("h", 5L, 7.0), ("h", 6L, 7.0))
      .toDF("grp", "id", "v")
  }

  test("discrete quantiles are data values at rank ceil(q*n)") {
    val q = RobustScale.discreteQuantiles(toy, Seq("grp"), "v", Seq("id"),
      Seq(0.25, 0.5, 0.75))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(q == Set(("g", 0.25, 1.0), ("g", 0.5, 2.0), ("g", 0.75, 3.0),
      ("h", 0.25, 7.0), ("h", 0.5, 7.0), ("h", 0.75, 7.0)))
  }

  test("scaled = (x - med)/iqr; zero-IQR groups yield null") {
    val out = RobustScale.robustScale(toy, Seq("grp"), "v", Seq("id"))
      .orderBy(col("id")).collect()
    val g = out.filter(_.getString(0) == "g").map(_.getDouble(3)).toSeq
    assert(g == Seq((1.0 - 2.0) / 2.0, 0.0, 0.5, 1.0))
    assert(out.filter(_.getString(0) == "h").forall(_.isNullAt(3)))
  }

  test("stats side is broadcast — no second shuffle of the data side") {
    val plan = RobustScale.robustScale(toy, Seq("grp"), "v", Seq("id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
