package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EncodingSpec extends SparkSpec {
  import spark.implicits._

  private val moji = "caf\u00C3\u00A9 ma\u00C3\u00B1ana"

  private def docs = Seq(
    (1L, "clean ascii text"),
    (2L, "bad \uFFFD here \uFFFD twice"),
    (3L, "ctrl\u0001mid\u0008end"),
    (4L, moji),
    (5L, "tabs\tand\nnewlines are legitimate")
  ).toDF("doc_id", "text")

  test("census counts each artifact class; tab/newline stay legitimate") {
    val r = Encoding.census(docs, "doc_id", "text")
      .orderBy($"doc_id").as[(Long, Long, Long, Long, Int)].collect().toSeq
    assert(r == Seq(
      (1L, 0L, 0L, 0L, 1),
      (2L, 2L, 0L, 0L, 0),
      (3L, 0L, 2L, 0L, 0),
      (4L, 0L, 0L, 2L, 0),
      (5L, 0L, 0L, 0L, 1)))
  }

  test("repair strips replacement/ctrl and reverses mojibake, else untouched") {
    val r = Encoding.repair(docs, "text")
      .orderBy($"doc_id").as[(Long, String)].collect().toMap
    assert(r(1L) == "clean ascii text")
    assert(r(2L) == "bad  here  twice")
    assert(r(3L) == "ctrlmidend")
    assert(r(4L) == "caf\u00E9 ma\u00F1ana")
    assert(r(5L) == "tabs\tand\nnewlines are legitimate")
  }

  test("every mojibake pair reverses; repaired text is census-clean") {
    val all = Encoding.MojibakePairs.map(_._1).mkString(" ")
    val fixedAll = Encoding.MojibakePairs.map(_._2).mkString(" ")
    val d = Seq((1L, all)).toDF("doc_id", "text")
    assert(Encoding.repair(d, "text").as[(Long, String)].head()._2 == fixedAll)
    val rec = Encoding.census(Encoding.repair(docs, "text"), "doc_id", "text")
      .agg(min($"clean")).head().getInt(0)
    assert(rec == 1, "repair output must census as clean")
  }
}
