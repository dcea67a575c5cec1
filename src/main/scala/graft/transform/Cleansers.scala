package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst replacements for the reference's seven Python UDFs
  * plus the cast/normalize machinery (SURVEY.md §2.9 C1–C13, §2.10).
  * Replacing opaque Python UDFs with codegen'd expressions is the
  * rewrite's headline optimization: predicate pushdown is no longer
  * blocked and the whole cleanse stage stays in one WholeStageCodegen
  * span (§4).
  *
  * Python-semantics notes (SURVEY §7 risk 3): `rstrip('%')` strips ALL
  * trailing `%` → regex `%+$`; `split('-')[0]` of a dash-less string is
  * the whole string → `substring_index` matches that.
  */
object Cleansers {

  /** C5/C6 — strip all trailing '%' (null-propagating, like the udf). */
  def stripPercent(c: Column): Column = regexp_replace(c, "%+$", "")

  /** C5+C11 — "12.74%" → 12.74 */
  def percentToDouble(c: Column): Column = stripPercent(c).cast(DoubleType)

  /** C7 — "Apr-2011" → "Apr"; dash-less input passes through whole. */
  def monthToken(c: Column): Column = substring_index(c, "-", 1)

  /** C8 — " 36 months" → 36.0 (cast trims whitespace). */
  def termMonths(c: Column): Column =
    regexp_replace(c, "months", "").cast(DoubleType)

  /** C10 — prediction relabel. */
  def relabel(c: Column, matchVal: Double, hit: String, miss: String): Column =
    when(c === matchVal, hit).otherwise(miss)

  /** C11/C13 — declarative cast plan: one `select`, not N analysis
    * passes of `withColumn`.
    */
  final case class ColumnSpec(name: String, target: DataType,
                              cleanse: Column => Column = identity)
  /** HTML→text extraction (the WARC→plain-text step of crawl
    * pipelines): drop script/style blocks wholesale, strip remaining
    * tags, unescape the five XML entities plus numeric space, collapse
    * whitespace runs, trim. Pure codegen'd regexp/replace chain on the
    * scan projection — zero shuffles, and every pattern is
    * lookahead-free so the DuckDB (RE2) oracle runs the identical
    * regexes. `(?s)` makes `.` span newlines in the block patterns;
    * `(?i)` covers cased tags.
    */
  /** Entity table shared with the SQL oracle spelling — order matters
    * (see [[stripHtml]]).
    */
  val HtmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  def stripHtml(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]*>", " ")
    // literal replaces (no regex): &amp; LAST so double-escaped input
    // ("&amp;lt;") unescapes one level, not two — the standard order
    val unescaped = HtmlEntities.foldLeft(noTags) {
      case (col0, (from, to)) => replace(col0, lit(from), lit(to)) }
    trim(regexp_replace(unescaped, "\\s+", " "))
  }

  def applyCastPlan(df: DataFrame, specs: Seq[ColumnSpec]): DataFrame = {
    val bySpec = specs.map(s => s.name -> s).toMap
    df.select(df.columns.toSeq.map { c =>
      bySpec.get(c) match {
        case Some(s) => s.cleanse(col(c)).cast(s.target).as(c)
        case None    => col(c)
      }
    }: _*)
  }

  /** C9+A6 — min-max normalization. The reference collects min/max to
    * the driver and closes over them in a Python UDF
    * (loanStat-DataproctoBQ.py:241-287); we keep the two-job shape but
    * broadcast the 1-row aggregate and do the arithmetic natively.
    * Constant columns (max == min) normalize to 0.0 instead of dividing
    * by zero (latent reference bug, SURVEY §7 risk 4).
    */
  def minMaxNormalize(df: DataFrame, cols: Seq[String], suffix: String = "_norm"): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"__min_$c"), max(col(c)).as(s"__max_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val joined = df.crossJoin(broadcast(stats))
    val normed = cols.foldLeft(joined) { (d, c) =>
      val lo = col(s"__min_$c"); val hi = col(s"__max_$c")
      d.withColumn(c + suffix,
        when(hi === lo, lit(0.0)).otherwise((col(c) - lo) / (hi - lo)))
    }
    normed.drop(cols.flatMap(c => Seq(s"__min_$c", s"__max_$c")): _*)
  }
}
