package graft.quality

import graft.operators.Exact
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, NumericType}

/** Null detection & repair (SURVEY.md §2.4; reference sites
  * "Null Detection and Null Replacement.ipynb" cells 4–14 and
  * BDE4-Workshop1-1530.ipynb cells 25–42).
  *
  * All operators are single-pass declarative plans except
  * [[imputeMean]], which is the reference's deliberate two-phase
  * "manual scalar subquery" (aggregate job → repair job). We keep the
  * two-job structure but broadcast the 1-row aggregate instead of
  * collecting scalars into a closure — at 1000 executors that is one
  * tiny broadcast, not a driver round-trip per column, and the repair
  * stage stays in whole-stage codegen.
  */
object NullRepair {

  /** N1 — per-column null counts, one output row, original column names. */
  def nullCensus(df: DataFrame): DataFrame =
    df.select(df.columns.map(c =>
      count(when(col(c).isNull, lit(1))).as(c)): _*)

  /** F4/N2 — rows where any column is null (dynamic OR-fold). */
  def rowsWithAnyNull(df: DataFrame): DataFrame =
    df.filter(df.columns.map(col(_).isNull).reduce(_ || _))

  /** N3/N4/N5 — drop rows by null policy. */
  def dropNulls(df: DataFrame, how: String = "any", subset: Seq[String] = Nil): DataFrame =
    if (subset.isEmpty) df.na.drop(how) else df.na.drop(how, subset)

  /** N6/N7 — constant fills (per-column map, type-coerced like the
    * reference's `fillna` dict).
    */
  def fill(df: DataFrame, values: Map[String, Any]): DataFrame =
    df.na.fill(values)

  /** N8 — mean imputation of numeric columns: exact decimal mean over
    * the non-null values, broadcast back, `coalesce` repair.
    */
  def imputeMean(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(sum(Exact.dec(col(c))).cast(DoubleType).as(s"__sum_$c"),
          count(col(c)).cast(DoubleType).as(s"__n_$c"))
    }
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val joined = df.crossJoin(broadcast(stats))
    val repaired = cols.foldLeft(joined) { (d, c) =>
      d.withColumn(c, coalesce(col(c), col(s"__sum_$c") / col(s"__n_$c")))
    }
    repaired.drop(cols.flatMap(c => Seq(s"__sum_$c", s"__n_$c")): _*)
  }

  /** N9 — median imputation via spark.ml Imputer; the reference fits
    * the statistic on a *filtered subset* and applies it to the full
    * frame (Null Detection….ipynb cells 12–14), hence `fitOn`.
    */
  def imputeMedian(df: DataFrame, cols: Seq[String],
                   fitOn: Option[DataFrame] = None): DataFrame = {
    val imputer = new org.apache.spark.ml.feature.Imputer()
      .setInputCols(cols.toArray).setOutputCols(cols.toArray)
      .setStrategy("median")
    imputer.fit(fitOn.getOrElse(df)).transform(df)
  }

  /** N9 (exact) — discrete-median imputation with PERCENTILE_DISC /
    * DuckDB `quantile_disc(0.5)` semantics: the statistic is the
    * element at rank ceil(n/2) of the sorted non-null fit values — an
    * actual data value, never interpolated, so the result is
    * cross-engine exact (no float arithmetic to disagree on).
    *
    * The rank is found with a global row_number window: a deliberate
    * single-partition sort of the *fit column only* (one double per
    * row after pruning). An exact rank statistic is inherently a
    * global-order question; the 100 TB path is [[imputeMedian]]
    * (Imputer → approxQuantile, mergeable GK sketches), and this
    * variant is the exactness gate that keeps the approx path honest.
    * The statistic then broadcasts back like [[imputeMean]] — no
    * driver-side collect anywhere.
    */
  def imputeMedianExact(df: DataFrame, c: String,
                        fitOn: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vals = fitOn.getOrElse(df).select(col(c)).filter(col(c).isNotNull)
    val n = vals.agg(count(lit(1)).as("__n"))
    val med = vals
      .withColumn("__rn", row_number().over(Window.orderBy(col(c))))
      .crossJoin(broadcast(n))
      // ceil(n/2) in exact long arithmetic: (n+1) div 2
      .filter(col("__rn") === expr("(__n + 1) div 2"))
      .select(col(c).as("__med"))
    df.crossJoin(broadcast(med))
      .withColumn(c, coalesce(col(c), col("__med")))
      .drop("__med")
  }

  /** N10 — group census with percent-of-total for null analysis.
    * The denominator joins in as a broadcast 1-row aggregate (same
    * discipline as imputeMean) — never a driver-side count(), which
    * would scan the input once more before the query even starts.
    */
  def groupCensus(df: DataFrame, keys: Seq[String]): DataFrame = {
    val total = df.agg(count(lit(1)).cast(DoubleType).as("__total"))
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .withColumn("percent", col("cnt").cast(DoubleType) / col("__total"))
      .drop("__total")
      .orderBy(desc("cnt"), struct(keys.map(col): _*))
  }
}
