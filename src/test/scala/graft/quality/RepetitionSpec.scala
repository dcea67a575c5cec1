package graft.quality

import org.apache.spark.sql.functions._

class RepetitionSpec extends graft.SparkSpec {
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("top bigram: lexicographic tie-break, char-weighted fraction") {
    // "a b":2 and "b a":2 tie — "a b" wins lexicographically
    val out = Repetition.topNgramCharFrac(
      docsDf((1L, "a b a b a c")), "doc_id", "text", Seq(2))
      .collect().head
    assert(out.getAs[String]("top_gram") == "a b")
    assert(out.getAs[Long]("top_count") == 2L)
    assert(out.getAs[Long]("top_chars") == 4L) // 2 occurrences × 2 chars
    assert(out.getAs[Long]("total_chars") == 6L)
    assert(out.getAs[Double]("top_frac") == 4.0 / 6.0)
  }

  test("top n-gram is char-weighted: long repeated gram dominates the fraction") {
    val out = Repetition.topNgramCharFrac(
      docsDf((1L, "aaaa bb aaaa bb cc")), "doc_id", "text", Seq(2))
      .collect().head
    assert(out.getAs[String]("top_gram") == "aaaa bb")
    assert(out.getAs[Long]("top_chars") == 12L) // 2 × (4+2)
    assert(out.getAs[Long]("total_chars") == 14L)
  }

  test("doc shorter than n reports zero counts and zero fraction") {
    val out = Repetition.topNgramCharFrac(
      docsDf((1L, "only three words")), "doc_id", "text", Seq(4))
      .collect().head
    assert(out.getAs[Long]("top_count") == 0L)
    assert(out.getAs[Long]("top_chars") == 0L)
    assert(out.getAs[String]("top_gram") == "")
    assert(out.getAs[Double]("top_frac") == 0.0)
    assert(out.getAs[Long]("total_chars") == 14L)
  }

  test("dup 5-gram coverage: disjoint occurrences cover both spans") {
    // "a b c d e" at positions 0 and 5: covers all 10 tokens
    val out = Repetition.dupNgramCharCoverage(
      docsDf((1L, "a b c d e a b c d e")), "doc_id", "text", 5)
      .collect().head
    assert(out.getAs[Long]("covered_chars") == 10L)
    assert(out.getAs[Long]("total_chars") == 10L)
    assert(out.getAs[Double]("dup_frac") == 1.0)
  }

  test("dup coverage is an interval UNION: overlapping duplicates never double-count") {
    // "x x x x x x": the 5-gram repeats at 0 and 1; union covers 6
    // tokens (double counting would claim 10)
    val out = Repetition.dupNgramCharCoverage(
      docsDf((1L, "x x x x x x")), "doc_id", "text", 5)
      .collect().head
    assert(out.getAs[Long]("covered_chars") == 6L)
    assert(out.getAs[Long]("total_chars") == 6L)
  }

  test("partial coverage and the no-duplicate negative control") {
    val out = Repetition.dupNgramCharCoverage(
      docsDf(
        (1L, "a b c d e f a b c d e z"), // dup at 0 and 6: covers 10 of 12
        (2L, "p q r s t u v w x y")),    // all 5-grams unique
      "doc_id", "text", 5)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("covered_chars") == 10L)
    assert(out(0).getAs[Long]("total_chars") == 12L)
    assert(out(0).getAs[Double]("dup_frac") == 10.0 / 12.0)
    assert(out(1).getAs[Long]("covered_chars") == 0L)
    assert(out(1).getAs[Double]("dup_frac") == 0.0)
  }

  test("repetition filter: clean doc survives, repeated-bigram and dup-5-gram docs are cut") {
    val clean = (0 until 30).map(i => f"w$i%02da").mkString(" ") // 30 unique 4-char tokens
    // dominant bigram: "xx yy" ×8 → 32 of 152 chars > 20 %
    val bigramHeavy = (0 until 30).map(i => f"u$i%02da").mkString(" ") +
      " xx yy xx yy xx yy xx yy xx yy xx yy xx yy xx yy"
    // duplicated 5-gram: two disjoint copies cover 20 of 100 chars
    // (> 15 %) while every top-n rule still passes — cut by coverage
    // alone; unique 2-char base tokens b0..b9, c0..c9, d0..d9, e0..e9
    val uniq40 = (0 until 40).map(i => s"${('b' + i / 10).toChar}${i % 10}")
    val dupFive = uniq40.mkString(" ") + " qq ww ee rr tt qq ww ee rr tt"
    val out = Repetition.repetitionFilter(
      docsDf((1L, clean), (2L, bigramHeavy), (3L, dupFive)),
      "doc_id", "text").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L),
      s"only the clean doc may survive the repetition cut, got $out")
  }

  test("repetition filter boundaries are inclusive: frac == limit survives each rule") {
    // 50 tokens × 2 chars = 100 total chars; the duplicated tail makes
    // top-4-gram chars 2×8 = 16 == 16 % of 100 (inclusive top rule OK)
    // while dup-5-gram coverage 20 > 15 cuts it — proving the doc
    // fails ONLY the coverage rule. Trimming the tail to a partial
    // echo (no repeated 4-gram, no repeated 5-gram) and the doc
    // survives: the top rules alone pass.
    val uniq40 = (0 until 40).map(i => s"${('b' + i / 10).toChar}${i % 10}")
    val atBound = uniq40.mkString(" ") + " qq ww ee rr tt qq ww ee rr tt"
    val noDup = uniq40.mkString(" ") + " qq ww ee rr tt qq ww ee"
    val out = Repetition.repetitionFilter(
      docsDf((1L, atBound), (2L, noDup)), "doc_id", "text")
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(2L), s"expected only the coverage-clean doc, got $out")
  }

  test("empty tokens from double spaces contribute zero chars, totals stay consistent") {
    // "a  b" splits to ["a", "", "b"]: 3 tokens, char sum 2 ==
    // len(replace(text,' ',''))
    val out = Repetition.topNgramCharFrac(
      docsDf((1L, "a  b a  b")), "doc_id", "text", Seq(2))
      .collect().head
    assert(out.getAs[Long]("total_chars") == 4L)
    // bigrams: "a "(x2 as "a"+""), " b"(x2), "b a"(1) — top is the
    // lexicographically smallest of the count-2 grams
    assert(out.getAs[Long]("top_count") == 2L)
  }
}
