package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4 — Apache access-log parsing, pure-native: `regexp_extract` per
  * group over a relational text scan + `to_timestamp` reassembly. The
  * reference does this with an RDD + Python `re`/`time.mktime`
  * (Dataproc_withGS-BQ-Spark_Core-GCS-Data_Prep_for_Unstructure_Data.py:35,63-91);
  * the native form keeps pushdown/codegen and needs no Python workers.
  * Non-matching lines yield empty-string groups → all-null row after
  * the numeric casts, removed by `na.drop` like the reference's
  * `dropna(how='any')`.
  */
object LogParser {

  /** One regex, RE2-compatible (so the DuckDB oracle can share it). */
  val ApacheLogPattern: String =
    "(\\S+) - - \\[(\\d{2})/(\\S+)/(\\d{4}):(\\d{2}):(\\d{2}):(\\d{2}) (\\S+)\\] \"(\\w+) (\\S+) (\\S+)\" (\\d{3}) (\\d+)"

  /** Empty group (no match) becomes NULL so the downstream cast is
    * null-propagating rather than an ANSI cast error.
    */
  private def grp(line: Column, i: Int): Column = {
    val g = regexp_extract(line, ApacheLogPattern, i)
    when(g === "", lit(null)).otherwise(g)
  }

  /** Parse a `value` column of raw lines into the typed log schema. */
  def parse(lines: DataFrame, lineCol: String = "value"): DataFrame = {
    val c = col(lineCol)
    lines.select(
      grp(c, 1).as("ip_addr"),
      grp(c, 2).cast("int").as("day_of_month"),
      grp(c, 3).as("month"),
      grp(c, 4).cast("int").as("year"),
      grp(c, 5).cast("int").as("hour"),
      grp(c, 6).cast("int").as("minute"),
      grp(c, 7).cast("int").as("second"),
      grp(c, 8).as("timezone"),
      grp(c, 9).as("method"),
      grp(c, 10).as("path"),
      grp(c, 11).as("protocol"),
      grp(c, 12).cast("int").as("status"),
      grp(c, 13).cast("long").as("bytes"))
  }

  /** Reassembled event timestamp (UTC-naive, like the reference's
    * mktime of the split fields; the zone column is carried separately).
    */
  def withTimestamp(parsed: DataFrame): DataFrame =
    parsed.withColumn("datetime_stamp",
      try_to_timestamp(
        concat_ws(" ",
          col("year"), col("month"), col("day_of_month"),
          format_string("%02d:%02d:%02d", col("hour"), col("minute"), col("second"))),
        lit("yyyy MMM d HH:mm:ss")))

  /** Full pipeline: parse, drop non-matching (any-null) rows. */
  def cleanParse(lines: DataFrame, lineCol: String = "value"): DataFrame =
    withTimestamp(parse(lines, lineCol)).na.drop("any")
}
