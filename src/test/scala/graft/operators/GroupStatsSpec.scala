package graft.operators

import org.apache.spark.sql.functions._

class GroupStatsSpec extends graft.SparkSpec {
  import spark.implicits._

  test("groupQuartiles picks exact ceil(q*n) ranks per group, nulls excluded") {
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)), ("a", Some(4.0)),
      ("a", Some(5.0)), ("a", Some(6.0)), ("a", Some(7.0)), ("a", None),
      ("b", Some(10.0)), ("b", Some(20.0))
    ).toDF("g", "v")
    val out = GroupStats.groupQuartiles(df, Seq("g"), "v")
      .orderBy($"g").as[(String, Long, Double, Double, Double)].collect()
    // a: n=7 -> ranks 2, 4, 6; b: n=2 -> ranks 1, 1, 2
    assert(out(0) == (("a", 7L, 2.0, 4.0, 6.0)))
    assert(out(1) == (("b", 2L, 10.0, 10.0, 20.0)))
  }

  test("groupQuartiles runs on ONE group-keyed exchange (window+count+agg share it)") {
    val df = graft.core.Tables.documents(spark, sf001)
    val q = GroupStats.groupQuartiles(df, Seq("source"), "n_chars")
    q.collect() // audit the FINAL adaptive plan, not the static one
    // (and only its final section — the AdaptiveSparkPlan string
    // repeats the pre-adaptive plan under "== Initial Plan ==")
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val exchanges = "ShuffleQueryStage".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 keyed exchange, got $exchanges:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }

  test("cardinalityProfile: exact counts, HLL within tolerance") {
    val df = (1 to 1000).map(i => (i.toLong, s"s${i % 7}")).toDF("id", "s")
    val out = GroupStats.cardinalityProfile(df, Seq("id", "s"))
      .orderBy($"col_name").as[(String, Long, Long, Int)].collect()
    assert(out(0)._1 == "id" && out(0)._2 == 1000L && out(0)._4 == 1,
      s"HLL estimate ${out(0)._3} outside 10% of 1000")
    assert(out(1) == (("s", 7L, 7L, 1)))
  }

  test("tokenBudgetTrim keeps rows that START inside the budget, per group") {
    val df = Seq(
      ("a", 1L, 300L), ("a", 2L, 300L), ("a", 3L, 300L), ("a", 4L, 300L),
      ("b", 5L, 900L), ("b", 6L, 50L)
    ).toDF("g", "id", "n")
    val kept = GroupStats.tokenBudgetTrim(df, "g", "n", budget = 800L,
      order = Seq(col("id"))).select($"id").as[Long].collect().toSet
    // a: cum 300,600,900,1200 -> starts 0,300,600,900: id 3 starts at 600 < 800
    // (straddles the boundary, kept); id 4 starts at 900 (dropped)
    // b: id 5 starts at 0 (kept, alone exceeds budget); id 6 starts at 900 (dropped)
    assert(kept == Set(1L, 2L, 3L, 5L))
  }

  test("filterByGroupMean: quantized integer compare, boundary group kept") {
    val df = Seq(
      ("lo", 1L, 0.30), ("lo", 2L, 0.40),          // mean .35 < .5
      ("at", 3L, 0.40), ("at", 4L, 0.60),          // mean exactly .5 -> kept (>=)
      ("hi", 5L, 0.90), ("hi", 6L, 0.80)           // mean .85
    ).toDF("g", "id", "score")
    val kept = GroupStats.filterByGroupMean(df, "g", col("score"), 500000L)
      .select($"id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L, 5L, 6L))
  }

  test("filterByGroupMean broadcasts the group keep-list (no corpus reshuffle)") {
    val df = graft.core.Tables.documents(spark, sf001)
      .select($"doc_id", $"source", $"text")
    val q = GroupStats.filterByGroupMean(df, "source",
      graft.functions.TextAnalysis.qualityScore($"text"), 485000L)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
