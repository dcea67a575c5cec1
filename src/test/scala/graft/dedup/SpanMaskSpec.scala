package graft.dedup

import org.apache.spark.sql.functions._

class SpanMaskSpec extends graft.SparkSpec {
  import spark.implicits._

  // 3 docs share the 6-token slogan (grams of 4 → 3 hit positions per
  // doc); each also has unique prose
  private val slogan = "click here to claim your reward"
  private def fixture = Seq(
    (1L, s"alpha beta gamma $slogan delta"),
    (2L, s"$slogan epsilon zeta eta theta iota"),
    (3L, s"kappa lambda $slogan"),
    (4L, "mu nu xi omicron pi rho sigma tau")
  ).toDF("doc_id", "text")

  test("mask spans cover exactly the shared slogan, merged to one span per doc") {
    val spans = SpanMask.maskDuplicatedSpans(fixture, "doc_id", "text",
      n = 4, minDocFreq = 3)
      .orderBy($"doc_id").as[(Long, Long, Long, Long)].collect()
    // doc1: slogan at tokens 3..8 (inclusive) -> span [3, 9)
    // doc2: tokens 0..5 -> [0, 6); doc3: tokens 2..7 -> [2, 8); doc4: none
    assert(spans.toSeq == Seq((1L, 3L, 9L, 6L), (2L, 0L, 6L, 6L), (3L, 2L, 8L, 6L)))
  }

  test("strip removes the slogan, keeps unique prose in order, untouched docs verbatim") {
    val out = SpanMask.stripDuplicatedSpans(fixture, "doc_id", "text",
      n = 4, minDocFreq = 3)
      .orderBy($"doc_id").as[(Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "epsilon zeta eta theta iota"),
      (3L, "kappa lambda"),
      (4L, "mu nu xi omicron pi rho sigma tau")))
  }

  test("a doc that is ONLY boilerplate disappears entirely") {
    val df = fixture.union(Seq((5L, slogan)).toDF("doc_id", "text"))
    val out = SpanMask.stripDuplicatedSpans(df, "doc_id", "text",
      n = 4, minDocFreq = 3)
    assert(!out.select("doc_id").as[Long].collect().contains(5L))
  }

  test("overlapping and adjacent hits coalesce into one span") {
    // shared 4-gram "a b c d" appears twice in doc 10, back to back:
    // hits at pos 0 and 4 are ADJACENT (end of first == start of
    // second) and must merge into [0, 8)
    val df = Seq(
      (10L, "a b c d a b c d tail1 tail2"),
      (11L, "x a b c d y z w"),
      (12L, "a b c d q r s t")
    ).toDF("doc_id", "text")
    val spans = SpanMask.maskDuplicatedSpans(df, "doc_id", "text",
      n = 4, minDocFreq = 3)
      .filter($"doc_id" === 10L)
      .as[(Long, Long, Long, Long)].collect()
    assert(spans.toSeq == Seq((10L, 0L, 8L, 8L)))
  }

  test("minSpanTokens: a 60-token shared block masks, a 10-token idiom survives") {
    // Lee et al.'s length knob: threshold 50 keeps the short shared
    // idiom (a merged island of 10 tokens) and catches only the long
    // block. Both plants clear the doc-freq census (2 docs each).
    val idiom = "limited time offer click here to claim your reward now"
    val block = (1 to 60).map(i => s"dup$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $idiom gamma"),
      (2L, s"$idiom delta epsilon"),
      (3L, s"zeta $block eta"),
      (4L, s"theta iota $block")
    ).toDF("doc_id", "text")
    val spans = SpanMask.maskDuplicatedSpans(docs, "doc_id", "text",
      n = 5, minDocFreq = 2, minSpanTokens = 50L)
      .orderBy($"doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    // only the block docs carry spans: doc3 tokens 1..60 -> [1, 61),
    // doc4 tokens 2..61 -> [2, 62)
    assert(spans == Seq((3L, 1L, 61L, 60L), (4L, 2L, 62L, 60L)))
    // strip: idiom docs verbatim, block docs lose exactly the block
    val out = SpanMask.stripDuplicatedSpans(docs, "doc_id", "text",
      n = 5, minDocFreq = 2, minSpanTokens = 50L)
      .orderBy($"doc_id").as[(Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, s"alpha beta $idiom gamma"),
      (2L, s"$idiom delta epsilon"),
      (3L, "zeta eta"),
      (4L, "theta iota")))
    // and threshold 0 reproduces the old behavior (idiom masks too)
    val all = SpanMask.maskDuplicatedSpans(docs, "doc_id", "text",
      n = 5, minDocFreq = 2).count()
    assert(all == 4L)
  }

  test("within-doc repetition alone does not trigger masking (distinct-doc census)") {
    val df = Seq(
      (20L, "p q r s p q r s p q r s"),
      (21L, "unrelated words only here today"),
      (22L, "more unrelated words again now")
    ).toDF("doc_id", "text")
    val spans = SpanMask.maskDuplicatedSpans(df, "doc_id", "text",
      n = 4, minDocFreq = 2)
    assert(spans.count() == 0)
  }

  test("span merge runs on one doc-keyed exchange after the hit join") {
    // plant the slogan (sf0.001's random corpus has no naturally
    // frequent 5-grams — an empty result would collapse to
    // EmptyRelation under AQE and hide the join shape being audited)
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id",
        when($"doc_id" % 5 === 0, concat($"text", lit(" " + slogan)))
          .otherwise($"text").as("text"))
    val q = SpanMask.maskDuplicatedSpans(docs, "doc_id", "text", 5, 4L)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
