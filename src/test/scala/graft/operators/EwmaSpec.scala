package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EwmaSpec extends SparkSpec {

  private def toy = {
    import spark.implicits._
    // (key, seq, value) — deliberately shuffled input order
    Seq((2L, 2, 8.0), (1L, 1, 1.0), (1L, 3, 3.0), (2L, 1, 4.0),
      (1L, 2, 2.0), (3L, 1, 7.0))
      .toDF("k", "seq", "v")
  }

  test("fold matches the hand-computed recursion, per key, in order") {
    val out = Ewma.ewmaLast(toy, "k", "v", Seq("seq"), alpha = 0.25)
      .orderBy(col("k")).collect()
    // k=1: seed 1.0 -> 1*0.75+2*0.25=1.25 -> 1.25*0.75+3*0.25=1.6875
    // k=2: seed 4.0 -> 4*0.75+8*0.25=5.0
    // k=3: seed 7.0
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq((1L, 3L, 1.6875), (2L, 2L, 5.0), (3L, 1L, 7.0)))
  }

  test("input partitioning and order do not change the result") {
    val base = Ewma.ewmaLast(toy, "k", "v", Seq("seq"), 0.25).collect().toSet
    val shuffled = Ewma.ewmaLast(toy.repartition(7).orderBy(col("v")),
      "k", "v", Seq("seq"), 0.25).collect().toSet
    assert(base == shuffled)
  }

  test("null keys and values are excluded, not folded as zeros") {
    import spark.implicits._
    val withNulls = Seq[(java.lang.Long, Int, java.lang.Double)](
      (1L, 1, 10.0), (1L, 2, null), (null, 1, 99.0), (1L, 3, 20.0))
      .toDF("k", "seq", "v")
    val out = Ewma.ewmaLast(withNulls, "k", "v", Seq("seq"), 0.25).collect()
    assert(out.length == 1)
    // seed 10, then 10*0.75+20*0.25 = 12.5 (the null row skipped)
    assert(out.head.getLong(1) == 2L && out.head.getDouble(2) == 12.5)
  }

  test("plan has exactly one exchange (repartition) and no Window") {
    val plan = Ewma.ewmaLast(toy, "k", "v", Seq("seq"), 0.25)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
  }
}
