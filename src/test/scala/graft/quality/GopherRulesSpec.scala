package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  // minWords=3 so small literal docs can exercise every rule branch
  private def prof(rows: (Long, String)*) =
    GopherRules.profile(rows.toDF("doc_id", "text"), "doc_id", "text",
      minWords = 3, maxWords = 10)
      .orderBy($"doc_id")
      .select($"doc_id", $"r_wordcount", $"r_meanlen", $"r_alpha",
        $"r_stop", $"pass")
      .as[(Long, Int, Int, Int, Int, Int)].collect().toSeq

  test("each rule trips independently; pass is their conjunction") {
    val r = prof(
      (1L, "the cat and the dog run"),          // all pass
      (2L, "the and"),                           // too few words
      (3L, "the and cat dog cow pig hen ant bat fox owl"), // too many (11)
      (4L, "xy the ab and cd"),                  // mean len 2 < 3
      (5L, "the 9numeric9 w0rd and x1 y2"),      // alpha ratio 2/6 < 0.8
      (6L, "cat dog cow pig hen"))               // zero stopword hits
    assert(r == Seq(
      (1L, 1, 1, 1, 1, 1),
      (2L, 0, 1, 1, 1, 0),
      (3L, 0, 1, 1, 1, 0),
      (4L, 1, 0, 1, 1, 0),
      (5L, 1, 1, 0, 1, 0),
      (6L, 1, 1, 1, 0, 0)))
  }

  test("counters and the exact-division mean are what the rules read") {
    val p = GopherRules.profile(
      Seq((1L, "the cats and dogs")).toDF("doc_id", "text"),
      "doc_id", "text", minWords = 3, maxWords = 10)
      .as[(Long, Long, Long, Long, Long, Double, Int, Int, Int, Int, Int)]
      .head()
    // 4 words, 14 chars, all alpha, 2 stop hits (the, and)
    assert(p._2 == 4L && p._3 == 14L && p._4 == 4L && p._5 == 2L)
    assert(p._6 == 14.0 / 4.0)
  }

  test("filterPass keeps exactly the passing docs with columns intact") {
    val docs = Seq(
      (1L, "the cat and the dog run"),
      (6L, "cat dog cow pig hen")).toDF("doc_id", "text")
    val kept = GopherRules.filterPass(docs, "doc_id", "text",
      minWords = 3, maxWords = 10)
    assert(kept.columns.toSeq == Seq("doc_id", "text"))
    assert(kept.select($"doc_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("boundary exactness: integer cross-multiplied bounds, no float drift") {
    // mean exactly 3.0 and exactly 10.0 both PASS (inclusive bounds);
    // alpha ratio exactly 0.8 passes
    val r = prof(
      (1L, "the abc off zzz"),                       // mean = 12/4 = 3.0
      (2L, "the of aaaaaaaaaaaaaaaaaaaaaaaaa"),      // mean = 30/3 = 10.0
      (3L, "the of ab cd x9"))                       // alpha 4/5 = 0.8
    assert(r(0)._3 == 1 && r(1)._3 == 1)
    assert(r(2)._4 == 1)
  }

  test("aux rules: symbol and numeric boundaries inclusive, ellipsis forms counted once each") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val docs = Seq(
      // 10 words, 1 '#': 10*1 <= 10 — exactly AT the symbol bound: pass
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 #"),
      // 10 words, 2 symbols ('...' once, '…' once): 20 > 10 — trip
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 ... …"),
      // 5 words, 1 numeric: 5*1 <= 5 exactly AT the numeric bound: pass
      (3L, "a b c d 42"),
      // 5 words, 2 numeric: 10 > 5 — trip
      (4L, "a b c 42 7"))
      .toDF("doc_id", "text")
    val r = GopherRules.auxProfile(docs, "doc_id", "text")
      .orderBy(col("doc_id"))
      .select(col("n_hash"), col("n_ellipsis"), col("n_numeric_words"),
        col("r_symbol"), col("r_numeric"), col("pass"))
      .as[(Long, Long, Long, Int, Int, Int)].collect().toSeq
    assert(r(0) == ((1L, 0L, 0L, 1, 1, 1)), s"got ${r(0)}")
    assert(r(1) == ((0L, 2L, 0L, 0, 1, 0)), s"got ${r(1)}")
    assert(r(2) == ((0L, 0L, 1L, 1, 1, 1)), s"got ${r(2)}")
    assert(r(3) == ((0L, 0L, 2L, 1, 0, 0)), s"got ${r(3)}")
  }
}
