package graft.transform

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Python-semantics parity for the native UDF replacements
  * (SURVEY.md §2.9 C5–C10, §7 risk 3).
  */
class CleansersSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c).head().get(0)

  test("C5: stripPercent strips ALL trailing % like Python rstrip") {
    assert(one(Cleansers.stripPercent(lit("12.74%"))) == "12.74")
    assert(one(Cleansers.stripPercent(lit("57%%%"))) == "57")
    assert(one(Cleansers.stripPercent(lit("5%x%"))) == "5%x")
    assert(one(Cleansers.percentToDouble(lit("12.74%"))) == 12.74)
    assert(one(Cleansers.stripPercent(lit(null).cast("string"))) == null)
  }

  test("C7: monthToken takes text before first dash; dash-less passes whole") {
    assert(one(Cleansers.monthToken(lit("Apr-2011"))) == "Apr")
    assert(one(Cleansers.monthToken(lit("nodash"))) == "nodash")
    assert(one(Cleansers.monthToken(lit("a-b-c"))) == "a")
  }

  test("C8: termMonths parses ' 36 months' to 36.0") {
    assert(one(Cleansers.termMonths(lit(" 36 months"))) == 36.0)
    assert(one(Cleansers.termMonths(lit("60 months"))) == 60.0)
  }

  test("C10: relabel") {
    assert(one(Cleansers.relabel(lit(1.0), 1.0, "Charged Off", "Fully Paid")) == "Charged Off")
    assert(one(Cleansers.relabel(lit(0.0), 1.0, "Charged Off", "Fully Paid")) == "Fully Paid")
  }

  test("C11: cast plan hardens string columns in one projection") {
    import Cleansers.ColumnSpec
    import org.apache.spark.sql.types.DoubleType
    val df = Seq(("12.74%", " 36 months", "Apr-2011")).toDF("int_rate", "term", "earliest_cr_line")
    val out = Cleansers.applyCastPlan(df, Seq(
      ColumnSpec("int_rate", DoubleType, Cleansers.stripPercent),
      ColumnSpec("term", DoubleType, c => regexp_replace(c, "months", ""))))
    val r = out.head()
    assert(r.getDouble(0) == 12.74 && r.getDouble(1) == 36.0 && r.getString(2) == "Apr-2011")
  }

  test("C14: stripHtml drops blocks, tags, entities; collapses whitespace") {
    def strip(s: String): String = {
      import org.apache.spark.sql.functions.{col => c}
      Seq(s).toDF("h").select(Cleansers.stripHtml(c("h"))).as[String].head()
    }
    assert(strip("<p>hello <b>world</b></p>") == "hello world")
    // script/style contents die wholesale, even with < > inside
    assert(strip("<script>if (a<b) { x(); }</script>body<style>p{}</style>")
      == "body")
    assert(strip("a &amp; b &lt;c&gt; &quot;d&quot; it&#39;s&nbsp;e")
      == "a & b <c> \"d\" it's e")
    // double-escaped input unescapes ONE level (&amp; runs last)
    assert(strip("&amp;lt;tag&amp;gt;") == "&lt;tag&gt;")
    assert(strip("  a\n\n\tb   c  ") == "a b c")
    // cased tags and multiline blocks
    assert(strip("<SCRIPT>\nvar y = 2;\n</SCRIPT><P>ok</P>") == "ok")
  }

  test("C9: minMaxNormalize maps to [0,1]; constant column → 0.0 (guarded)") {
    val df = Seq((1, 10.0, 5.0), (2, 20.0, 5.0), (3, 30.0, 5.0)).toDF("id", "x", "k")
    val out = Cleansers.minMaxNormalize(df, Seq("x", "k")).orderBy($"id")
    val rows = out.select($"x_norm", $"k_norm").as[(Double, Double)].collect()
    assert(rows.toSeq == Seq((0.0, 0.0), (0.5, 0.0), (1.0, 0.0)))
  }
}
