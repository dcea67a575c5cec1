package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IQR (Tukey-fence) outlier detection — the EDA census step between
  * profiling and repair: flag rows whose value falls outside
  * [q1 − k·IQR, q3 + k·IQR].
  *
  * Quartiles are DISCRETE (ANSI PERCENTILE_DISC / DuckDB
  * quantile_disc: the element at rank ceil(q·n) of the sorted non-null
  * values — an actual data value, never interpolated), so bounds and
  * verdicts are cross-engine exact: the only float arithmetic is the
  * fence assembly, spelled identically on both engines.
  *
  * Scale note (same contract as NullRepair.imputeMedianExact): the
  * rank pick is a deliberate single-partition sort of the pruned value
  * column only — exact rank statistics are inherently global-order
  * questions, and this is the exactness gate. The 100 TB path is
  * [[iqrBoundsApprox]]/[[iqrOutliersApprox]]: percentile_approx
  * (mergeable sketches) with identical downstream fencing; both
  * quartiles come out of ONE pass, and the 1-row bounds broadcast
  * back — no driver collect on either path.
  */
object Outliers {

  /** One row: (q1, q3, lo, hi) for `c` with multiplier `k`. */
  def iqrBounds(df: DataFrame, c: String, k: Double): DataFrame = {
    val vals = df.select(col(c)).filter(col(c).isNotNull)
    val n = vals.agg(count(lit(1)).as("__n"))
    val picks = vals
      .withColumn("__rn", row_number().over(Window.orderBy(col(c))))
      .crossJoin(broadcast(n))
      // ceil(q·n) in exact integer arithmetic: ceil(a·n/4) = (a·n+3) div 4
      .filter(col("__rn") === expr("(__n + 3) div 4") ||
        col("__rn") === expr("(3 * __n + 3) div 4"))
      .agg(
        min(when(col("__rn") === expr("(__n + 3) div 4"), col(c))).as("q1"),
        min(when(col("__rn") === expr("(3 * __n + 3) div 4"), col(c))).as("q3"))
    picks.select(col("q1"), col("q3"),
      (col("q1") - lit(k) * (col("q3") - col("q1"))).as("lo"),
      (col("q3") + lit(k) * (col("q3") - col("q1"))).as("hi"))
  }

  /** The 100 TB quartile path: `percentile_approx` (mergeable
    * Greenwald–Khanna sketches, one partial-aggregated pass, no global
    * sort) with fencing assembled IDENTICALLY to [[iqrBounds]]. The
    * sketch returns an actual data value (approximate-RANK discrete
    * quantile), so on a clean distribution the fences coincide with
    * the exact path's — OutliersSpec asserts equality on one — and at
    * any accuracy the error is bounded by rank, not value.
    */
  def iqrBoundsApprox(df: DataFrame, c: String, k: Double,
                      accuracy: Int = 10000): DataFrame = {
    val picks = df.filter(col(c).isNotNull)
      .agg(percentile_approx(col(c), lit(0.25), lit(accuracy)).as("q1"),
        percentile_approx(col(c), lit(0.75), lit(accuracy)).as("q3"))
    picks.select(col("q1"), col("q3"),
      (col("q1") - lit(k) * (col("q3") - col("q1"))).as("lo"),
      (col("q3") + lit(k) * (col("q3") - col("q1"))).as("hi"))
  }

  private def fenced(df: DataFrame, c: String, k: Double): DataFrame =
    df.crossJoin(broadcast(iqrBounds(df, c, k).select(col("lo"), col("hi"))))

  /** [[iqrOutliers]] on the approx quartile path — the form a 100 TB
    * run uses (exact twin = the verify gate).
    */
  def iqrOutliersApprox(df: DataFrame, c: String, k: Double = 1.5,
                        accuracy: Int = 10000): DataFrame =
    df.crossJoin(broadcast(
        iqrBoundsApprox(df, c, k, accuracy).select(col("lo"), col("hi"))))
      .filter(col(c).isNotNull && (col(c) < col("lo") || col(c) > col("hi")))
      .drop("lo", "hi")

  /** Rows OUTSIDE the fences (the outlier report). Null values are not
    * outliers (they are N-series territory, not R-series).
    */
  def iqrOutliers(df: DataFrame, c: String, k: Double = 1.5): DataFrame =
    fenced(df, c, k)
      .filter(col(c).isNotNull && (col(c) < col("lo") || col(c) > col("hi")))
      .drop("lo", "hi")

  /** Rows INSIDE the fences (nulls kept — repair is a separate pass). */
  def iqrFilter(df: DataFrame, c: String, k: Double = 1.5): DataFrame =
    fenced(df, c, k)
      .filter(col(c).isNull || (col(c) >= col("lo") && col(c) <= col("hi")))
      .drop("lo", "hi")

  /** DuckDB spelling of the bounds over `src`, as scalar subqueries. */
  def boundsSql(src: String, c: String, k: Double): (String, String) = {
    val q1 = s"(SELECT quantile_disc($c, 0.25) FROM $src WHERE $c IS NOT NULL)"
    val q3 = s"(SELECT quantile_disc($c, 0.75) FROM $src WHERE $c IS NOT NULL)"
    (s"($q1 - $k * ($q3 - $q1))", s"($q3 + $k * ($q3 - $q1))")
  }

  /** Winsorization: CLIP (not drop) values to the [loPct, hiPct]
    * discrete percentiles — outlier REPAIR where [[iqrFilter]] is
    * outlier removal; the standard tail-taming step before moment
    * statistics or minmax normalization (one crawl-bug 1e308 would
    * otherwise flatten c9's whole scale). Percentiles are integer
    * percents and ranks are exact integer arithmetic (ceil(p·n/100) =
    * (p·n+99) div 100), so the clip bounds are actual data values and
    * the result is cross-engine exact. Nulls pass through unclipped
    * (N-series territory).
    *
    * Same scale contract as [[iqrBounds]]: the rank pick sorts the
    * pruned value column once (the exactness gate);
    * [[winsorizeApprox]] is the sketch-bounds 100 TB path with
    * identical clip assembly.
    */
  def winsorize(df: DataFrame, c: String, loPct: Int = 5,
                hiPct: Int = 95): DataFrame = {
    require(0 <= loPct && loPct < hiPct && hiPct <= 100,
      s"need 0 <= loPct < hiPct <= 100: $loPct, $hiPct")
    val vals = df.select(col(c)).filter(col(c).isNotNull)
    val n = vals.agg(count(lit(1)).as("__n"))
    val bounds = vals
      .withColumn("__rn", row_number().over(Window.orderBy(col(c))))
      .crossJoin(broadcast(n))
      .filter(col("__rn") === expr(s"($loPct * __n + 99) div 100") ||
        col("__rn") === expr(s"($hiPct * __n + 99) div 100"))
      .agg(
        min(when(col("__rn") === expr(s"($loPct * __n + 99) div 100"), col(c)))
          .as("__lo"),
        min(when(col("__rn") === expr(s"($hiPct * __n + 99) div 100"), col(c)))
          .as("__hi"))
    clip(df, c, bounds)
  }

  /** Sketch-bounds winsorization (percentile_approx, one mergeable
    * pass — no global sort); clip assembly identical to [[winsorize]].
    */
  def winsorizeApprox(df: DataFrame, c: String, loPct: Int = 5,
                      hiPct: Int = 95, accuracy: Int = 10000): DataFrame = {
    val bounds = df.filter(col(c).isNotNull)
      .agg(percentile_approx(col(c), lit(loPct / 100.0), lit(accuracy)).as("__lo"),
        percentile_approx(col(c), lit(hiPct / 100.0), lit(accuracy)).as("__hi"))
    clip(df, c, bounds)
  }

  private def clip(df: DataFrame, c: String, bounds: DataFrame): DataFrame =
    df.crossJoin(broadcast(bounds))
      .withColumn(s"${c}_winsor",
        when(col(c) < col("__lo"), col("__lo"))
          .when(col(c) > col("__hi"), col("__hi"))
          .otherwise(col(c)))
      .drop("__lo", "__hi")
}
