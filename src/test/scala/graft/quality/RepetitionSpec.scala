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
