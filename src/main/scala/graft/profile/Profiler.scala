package graft.profile

import graft.operators.Exact
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Data profiling (SURVEY.md §2.5 A1–A8, §2.2 P2, §2.12 X3): row/column
  * counts, summary statistics, distinct censuses. The reference leans on
  * `df.describe()`; we additionally provide [[describeExact]], a
  * cross-engine-exact variant (decimal sums; textbook stddev over exact
  * moments) used by the oracle gate. For 100 TB profiling prefer
  * [[describeExact]] over `describe()` anyway: one aggregate job, no
  * string formatting, stays in codegen.
  *
  * Numerical note: the two-moment stddev formula is exact here because
  * both moments are decimal-exact before the final double arithmetic;
  * with raw double sums at extreme scale you'd want Welford/`stddev`
  * instead.
  */
object Profiler {

  def rowCount(df: DataFrame): Long = df.count()
  def columnCount(df: DataFrame): Int = df.columns.length
  def partitionCount(df: DataFrame): Int = df.rdd.getNumPartitions

  /** A7 — count/mean/stddev/min/max for one numeric column, one row. */
  def describeExact(df: DataFrame, c: String, scale: Int = 2): DataFrame = {
    val n = count(col(c)).cast(DoubleType)
    val s = sum(Exact.dec(col(c), scale)).cast(DoubleType)
    val s2 = sum((col(c) * col(c)).cast(org.apache.spark.sql.types.DecimalType(28, 2 * scale)))
      .cast(DoubleType)
    df.agg(
      count(col(c)).as("n"),
      (s / n).as("mean"),
      sqrt((s2 - s * s / n) / (n - lit(1.0))).as("stddev"),
      min(col(c)).as("min_v"),
      max(col(c)).as("max_v"))
  }

  /** DuckDB spelling of [[describeExact]] for oracle strings. */
  def describeExactSql(table: String, c: String, scale: Int = 2): String = {
    val s = s"CAST(SUM(CAST($c AS DECIMAL(18,$scale))) AS DOUBLE)"
    val s2 = s"CAST(SUM(CAST($c * $c AS DECIMAL(28,${2 * scale}))) AS DOUBLE)"
    val n = s"CAST(COUNT($c) AS DOUBLE)"
    s"""SELECT COUNT($c) AS n,
       |  $s / $n AS mean,
       |  SQRT(($s2 - $s * $s / $n) / ($n - 1.0)) AS stddev,
       |  MIN($c) AS min_v,
       |  MAX($c) AS max_v
       |FROM $table""".stripMargin
  }

  /** A8 — distinct values of a column, sorted. */
  def distinctValues(df: DataFrame, c: String): DataFrame =
    df.select(c).distinct().orderBy(col(c))

  /** A2/A3 — group census. */
  def groupCount(df: DataFrame, keys: String*): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("cnt"))
      .orderBy(keys.map(col): _*)

  /** O5 — the reference's `describe().toPandas().transpose()` report
    * (LAB-2022-Standalone-SparkML-CSV-to-MLPCModel-3.ipynb cell 31) as
    * a driver-side formatter: one row per COLUMN, stats across. The
    * aggregation itself is distributed (`describe`); only the tiny
    * (columns × 5) result is collected and pivoted on the driver.
    */
  def describeTransposed(df: DataFrame, cols: String*): String = {
    val described = if (cols.nonEmpty) df.describe(cols: _*) else df.describe()
    val d = described.collect()
    val stats = d.map(_.getString(0))                  // count/mean/stddev/min/max
    // names come from the describe OUTPUT, not df.columns: describe()
    // silently skips non-numeric/string columns (timestamps, arrays),
    // so indexing by df.columns would misalign and overrun
    val names = described.columns.drop(1).toIndexedSeq
    val header = "column" +: stats.toIndexedSeq
    val rows = names.zipWithIndex.map { case (c, i) =>
      c +: stats.indices.map(s => Option(d(s).getString(i + 1)).getOrElse("null")).toIndexedSeq
    }
    val widths = (header +: rows).transpose.map(_.map(_.length).max)
    ((header +: rows) map { r =>
      r.zip(widths).map { case (v, w) => v.padTo(w, ' ') }.mkString("  ")
    }).mkString("\n")
  }
}
