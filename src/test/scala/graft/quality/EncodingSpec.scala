package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EncodingSpec extends SparkSpec {
  import spark.implicits._

  private val moji = "caf\u00C3\u00A9 ma\u00C3\u00B1ana"
  // cp1252 plant: curly-quoted word (the right-quote form ends in the
  // INVISIBLE C1 U+009D), an en dash, a right single quote - all
  // codepoints escaped, nothing for an editor/locale to mangle
  private val cp1252 = "\u00E2\u20AC\u0153q\u00E2\u20AC\u009D \u00E2\u20AC\u201Cx\u00E2\u20AC\u2122"

  private def docs = Seq(
    (1L, "clean ascii text"),
    (2L, "bad \uFFFD here \uFFFD twice"),
    (3L, "ctrl\u0001mid\u0008end"),
    (4L, moji),
    (5L, "tabs\tand\nnewlines are legitimate"),
    (6L, cp1252)
  ).toDF("doc_id", "text")

  test("census counts each artifact class; tab/newline stay legitimate") {
    val r = Encoding.census(docs, "doc_id", "text")
      .orderBy($"doc_id").as[(Long, Long, Long, Long, Long, Int)]
      .collect().toSeq
    assert(r == Seq(
      (1L, 0L, 0L, 0L, 0L, 1),
      (2L, 2L, 0L, 0L, 0L, 0),
      (3L, 0L, 2L, 0L, 0L, 0),
      (4L, 0L, 0L, 2L, 0L, 0),
      (5L, 0L, 0L, 0L, 0L, 1),
      (6L, 0L, 0L, 0L, 4L, 0)))
  }

  test("repair strips replacement/ctrl and reverses mojibake, else untouched") {
    val r = Encoding.repair(docs, "text")
      .orderBy($"doc_id").as[(Long, String)].collect().toMap
    assert(r(1L) == "clean ascii text")
    assert(r(2L) == "bad  here  twice")
    assert(r(3L) == "ctrlmidend")
    assert(r(4L) == "caf\u00E9 ma\u00F1ana")
    assert(r(5L) == "tabs\tand\nnewlines are legitimate")
    assert(r(6L) == "\u201Cq\u201D \u2013x\u2019")
  }

  test("every mojibake pair reverses; repaired text is census-clean") {
    val all = (Encoding.MojibakePairs ++ Encoding.Cp1252Pairs)
      .map(_._1).mkString(" ")
    val fixedAll = (Encoding.MojibakePairs ++ Encoding.Cp1252Pairs)
      .map(_._2).mkString(" ")
    val d = Seq((1L, all)).toDF("doc_id", "text")
    assert(Encoding.repair(d, "text").as[(Long, String)].head()._2 == fixedAll)
    val rec = Encoding.census(Encoding.repair(docs, "text"), "doc_id", "text")
      .agg(min($"clean")).head().getInt(0)
    assert(rec == 1, "repair output must census as clean")
  }

  test("cp1252 C1 form: U+009D is NOT C0-stripped before its repair fires") {
    // the right-double-quote form ends in C1 U+009D; CtrlClass is C0
    // only, so the strip (which runs last anyway) cannot eat the form
    val d = Seq((1L, "a\u00E2\u20AC\u009Db")).toDF("doc_id", "text")
    assert(Encoding.repair(d, "text").as[(Long, String)].head()._2
      == "a\u201Db")
  }

  test("repair chain cascade is deterministic: feeding pairs still converge") {
    // a stray U+00E2 U+20AC followed by the left-quote form: the
    // quote repair materializes the en-dash form, which the later
    // pair in the same ordered fold then fixes
    val d = Seq((1L, "\u00E2\u20AC\u00E2\u20AC\u0153")).toDF("doc_id", "text")
    assert(Encoding.repair(d, "text").as[(Long, String)].head()._2
      == "\u2013")
  }

  test("sqlLit: printable runs quoted, C0/C1 as chr(n), quotes doubled") {
    assert(Encoding.Sql.sqlLit("") == "''")
    assert(Encoding.Sql.sqlLit("abc") == "'abc'")
    assert(Encoding.Sql.sqlLit("a\u009Db") == "'a' || chr(157) || 'b'")
    assert(Encoding.Sql.sqlLit("\u0001") == "chr(1)")
    assert(Encoding.Sql.sqlLit("it's") == "'it''s'")
    assert(Encoding.Sql.sqlLit("\u00E2\u20AC\u009D")
      == "'" + "\u00E2\u20AC" + "' || chr(157)")
  }
}
