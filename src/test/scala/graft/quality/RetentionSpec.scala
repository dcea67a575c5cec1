package graft.quality

import org.apache.spark.sql.functions._

class RetentionSpec extends graft.SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, 10, "en"), (2L, 50, "en"), (3L, 50, "fr"),
    (4L, 80, "en"), (5L, 5, "fr")
  ).toDF("id", "len", "lang")

  test("funnel counts cascading conjunctions, stage 0 is the raw total") {
    val out = Retention.funnel(docs, Seq(
      "long_enough" -> ($"len" >= 20),
      "english" -> ($"lang" === "en")))
      .orderBy($"stage_id")
      .as[(Int, String, Long, Double)].collect().toSeq
    assert(out == Seq(
      (0, "total", 5L, 1.0),
      (1, "long_enough", 3L, 0.6),
      (2, "english", 2L, 0.4)))
  }

  test("stage order matters: the funnel is a conjunction chain, not independent counts") {
    val reordered = Retention.funnel(docs, Seq(
      "english" -> ($"lang" === "en"),
      "long_enough" -> ($"len" >= 20)))
      .orderBy($"stage_id")
      .as[(Int, String, Long, Double)].collect().toSeq
    // stage 1 now counts english alone (3), final stage identical (2)
    assert(reordered(1)._3 == 3L && reordered(2)._3 == 2L)
  }

  test("one aggregate pass: no join, no window, single exchange") {
    val plan = Retention.funnel(docs, Seq("p" -> ($"len" >= 20)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Window"), plan)
  }
}
