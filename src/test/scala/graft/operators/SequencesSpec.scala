package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SequencesSpec extends SparkSpec {

  private val steps = Seq("a", "b", "c")

  private def toy = {
    import spark.implicits._
    Seq(
      // user 1: full funnel with noise in between
      (1L, 1, "a"), (1L, 2, "x"), (1L, 3, "b"), (1L, 4, "x"), (1L, 5, "c"),
      // user 2: b before a — only stage 1 (greedy in-order match)
      (2L, 1, "b"), (2L, 2, "a"), (2L, 3, "x"),
      // user 3: no step events at all
      (3L, 1, "x"),
      // user 4: a then c (skips b) — stage 1 only
      (4L, 1, "a"), (4L, 2, "c"))
      .toDF("u", "seq", "t")
  }

  test("greedy in-order subsequence stages") {
    val got = Sequences.funnelStages(toy, "u", "t", Seq("seq"), steps)
      .orderBy(col("u")).collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got == Seq((1L, 3), (2L, 1), (3L, 0), (4L, 1)))
  }

  test("order column governs the match, not input order") {
    import spark.implicits._
    // same rows as user 2 but seq reversed: a(1) then b(2) — stage 2
    val df = Seq((2L, 2, "b"), (2L, 1, "a")).toDF("u", "seq", "t")
    val got = Sequences.funnelStages(df.repartition(5), "u", "t", Seq("seq"), steps)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got == Seq((2L, 2)))
  }

  test("plan is one exchange, no window, no per-key array materialization") {
    val plan = Sequences.funnelStages(toy, "u", "t", Seq("seq"), steps)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("collect_list"), plan)
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
  }
}
