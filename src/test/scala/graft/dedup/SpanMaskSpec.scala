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

  test("adversarial rare-gram gap: the recall contract vs suffix-array exactness") {
    // A 31-token span duplicated in docs A and B whose FLANKS (15-token
    // blocks X and Z) also appear in doc C, with one middle token "mid"
    // present only in A/B: at minDocFreq = 3 every 5-gram containing
    // "mid" has doc-freq 2 (< 3), so the hit stream has a GAP mid-span
    // and islands+merge yields TWO 15-token islands, never the 31-token
    // span. This pins the operator's real contract: it removes ≥L-token
    // spans every of whose n-grams clears minDocFreq — NOT Lee et al.'s
    // "≥L-token substring occurring ≥k times". The two COINCIDE at the
    // paper's k = 2 on exact duplicates (every gram of a span shared by
    // 2 docs has doc-freq ≥ 2 — gram-cover completeness, asserted
    // below), and diverge only at k > 2 where the span itself sits
    // below the threshold; there the per-gram rule is the more
    // conservative side (under-masks, never over-masks across the gap).
    val x = (1 to 15).map(i => s"x$i").mkString(" ")
    val z = (1 to 15).map(i => s"z$i").mkString(" ")
    val df = Seq(
      (1L, s"pa1 pa2 pa3 pa4 pa5 $x mid $z ta1 ta2 ta3"), // A: span at [5, 36)
      (2L, s"pb1 pb2 pb3 pb4 $x mid $z"),                 // B: span at [4, 35)
      (3L, s"$x qc1 qc2 qc3 qc4 qc5 qc6 $z")              // C: flanks only
    ).toDF("doc_id", "text")
    // k = 3, L = 20: the gap splits the span into two 15-token islands,
    // both below L -> the 31-token A/B duplicate survives UNTOUCHED
    assert(SpanMask.maskDuplicatedSpans(df, "doc_id", "text",
      n = 5, minDocFreq = 3, minSpanTokens = 20).count() == 0L)
    // k = 3, L = 12: both islands mask, the rare-gram middle SURVIVES
    // (a partial strip — doc A keeps its prefix, "mid", and tail)
    val partial = SpanMask.stripDuplicatedSpans(df, "doc_id", "text",
      n = 5, minDocFreq = 3, minSpanTokens = 12)
      .filter($"doc_id" === 1L).as[(Long, String)].head()
    assert(partial._2 == "pa1 pa2 pa3 pa4 pa5 mid ta1 ta2 ta3")
    // k = 2 (the paper's threshold): gram-cover completeness — every
    // 5-gram of the A/B span clears doc-freq 2, the islands merge, and
    // the FULL ≥L span masks as one piece in both carriers. Doc C's
    // junk grams stay doc-freq 1, so its X/Z islands remain split at
    // 15 tokens each and fall below L — C masks nothing.
    val spans2 = SpanMask.maskDuplicatedSpans(df, "doc_id", "text",
      n = 5, minDocFreq = 2, minSpanTokens = 20)
      .orderBy($"doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(spans2 == Seq((1L, 5L, 36L, 31L), (2L, 4L, 35L, 31L)))
  }

  test("EXACT criterion closes the rare-gram gap: the full span masks at k=2") {
    // the adversarial corpus from the arm above, under the EXACT
    // Lee-et-al criterion (L-gram OCCURRENCE census): the 31-token
    // A/B span — including the rare middle token the doc-freq
    // approximation gapped on — masks as ONE island in both carriers,
    // because every 20-gram inside it occurs twice in the corpus
    val x = (1 to 15).map(i => s"x$i").mkString(" ")
    val z = (1 to 15).map(i => s"z$i").mkString(" ")
    val df = Seq(
      (1L, s"pa1 pa2 pa3 pa4 pa5 $x mid $z ta1 ta2 ta3"),
      (2L, s"pb1 pb2 pb3 pb4 $x mid $z"),
      (3L, s"$x qc1 qc2 qc3 qc4 qc5 qc6 $z")
    ).toDF("doc_id", "text")
    val spans = SpanMask.maskDuplicatedSpansExact(df, "doc_id", "text",
      spanTokens = 20, minCount = 2)
      .orderBy($"doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(spans == Seq((1L, 5L, 36L, 31L), (2L, 4L, 35L, 31L)))
    // and the strip removes exactly the span, middle included
    val stripped = SpanMask.stripDuplicatedSpansExact(df, "doc_id", "text",
      spanTokens = 20, minCount = 2)
      .orderBy($"doc_id").as[(Long, String)].collect().toSeq
    assert(stripped == Seq(
      (1L, "pa1 pa2 pa3 pa4 pa5 ta1 ta2 ta3"),
      (2L, "pb1 pb2 pb3 pb4"),
      (3L, s"$x qc1 qc2 qc3 qc4 qc5 qc6 $z")))
  }

  test("EXACT criterion counts OCCURRENCES: a doc repeating its own block masks it") {
    // the paper's corpus-occurrence semantics — within-doc repeats
    // count (contrast the distinct-doc census arm below); both copies
    // of the 20-token block mask, the unique filler survives
    val block = (1 to 20).map(i => s"b$i").mkString(" ")
    val df = Seq(
      (1L, s"$block u1 u2 u3 $block"),
      (2L, "completely unrelated words in this other document entirely")
    ).toDF("doc_id", "text")
    val spans = SpanMask.maskDuplicatedSpansExact(df, "doc_id", "text",
      spanTokens = 20, minCount = 2)
      .orderBy($"span_start").as[(Long, Long, Long, Long)].collect().toSeq
    assert(spans == Seq((1L, 0L, 20L, 20L), (1L, 23L, 43L, 20L)))
    val stripped = SpanMask.stripDuplicatedSpansExact(df, "doc_id", "text",
      spanTokens = 20, minCount = 2)
      .filter($"doc_id" === 1L).as[(Long, String)].head()
    assert(stripped._2 == "u1 u2 u3")
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
