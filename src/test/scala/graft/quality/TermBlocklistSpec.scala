package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TermBlocklistSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick spam fox spam"),   // 2 hits, 1 term
    (2L, "clean words only here"),     // clean
    (3L, "SPAM and Junk and spam"),    // case-folds: 3 hits, 2 terms
    (4L, "spammy is not spam-my"),     // token boundary: no hit
    (5L, "")                           // empty doc: no tokens, clean
  ).toDF("doc_id", "text")

  private val terms = Seq("spam", "junk")

  test("profile counts occurrences and distinct terms, case-folded") {
    val r = TermBlocklist.profile(docs, "doc_id", "text", terms)
      .orderBy($"doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq((1L, 2L, 1L), (3L, 3L, 2L)))
  }

  test("filterClean keeps exactly the hit-free docs, columns intact") {
    val kept = TermBlocklist.filterClean(docs, "doc_id", "text", terms)
    assert(kept.columns.toSeq == Seq("doc_id", "text"))
    assert(kept.select($"doc_id").as[Long].collect().sorted.toSeq ==
      Seq(2L, 4L, 5L))
    // token-boundary semantics: 'spammy' / 'spam-my' are NOT 'spam'
    assert(kept.filter($"doc_id" === 4L).count() == 1L)
  }

  test("terms list is deduped/case-folded; empty list rejected") {
    val r = TermBlocklist.profile(docs, "doc_id", "text",
      Seq("SPAM", "spam", "Spam"))
      .orderBy($"doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq((1L, 2L, 1L), (3L, 2L, 1L)))
    intercept[IllegalArgumentException] {
      TermBlocklist.profile(docs, "doc_id", "text", Seq.empty)
    }
  }

  test("plan: blocklist and hit-ids both broadcast; corpus never reshuffles") {
    val kept = TermBlocklist.filterClean(
      graft.core.Tables.documents(spark, sf0001)
        .select($"doc_id", $"text"),
      "doc_id", "text", Seq("slow", "dup"))
    kept.collect()
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
