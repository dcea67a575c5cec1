package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust (median/IQR) feature scaling — the outlier-resistant sibling
  * of the reference's min-max normalization (SURVEY §2.9 C9), standard
  * ML-prep for heavy-tailed columns.
  *
  * Quantiles here are DISCRETE: the q-quantile of a group is the
  * element at rank ceil(q·n) in (value, tiebreak) order. No
  * interpolation means the statistic is an actual data value and is
  * bit-identical on any engine that sorts the same way — unlike
  * interpolated percentiles, whose last-ulp arithmetic differs across
  * engines (see a13). ceil(q·n) itself is exact for q ∈ {.25,.5,.75}
  * (dyadic·integer and 3n/4 are exact IEEE products).
  *
  * Scale design: one ranking window over the data (same shuffle a
  * groupBy would pay), then a per-group 3-row statistics table that
  * broadcast-joins back — the big side is never shuffled twice and the
  * scaling projection stays in whole-stage codegen.
  */
object RobustScale {

  /** Per-group discrete quantiles: keyCols…, q, value — one row per
    * (group, q).
    */
  def discreteQuantiles(df: DataFrame, keyCols: Seq[String], valueCol: String,
                        tiebreakCols: Seq[String], qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0), s"qs in (0,1]: $qs")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((valueCol +: tiebreakCols).map(col): _*)
    val wn = Window.partitionBy(keyCols.map(col): _*)
    df.select((keyCols ++ (valueCol +: tiebreakCols)).distinct.map(col): _*)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wn))
      .select(col("*"), explode(array(qs.map(lit): _*)).as("q"))
      .filter(col("__rn") === ceil(col("q") * col("__n")).cast("long"))
      .select((keyCols.map(col) :+ col("q") :+ col(valueCol).as("value")): _*)
  }

  /** (x − median) / (p75 − p25) per group; null where the IQR is zero
    * (constant groups have no robust scale).
    */
  def robustScale(df: DataFrame, keyCols: Seq[String], valueCol: String,
                  tiebreakCols: Seq[String], as: String = "scaled"): DataFrame = {
    val stats = discreteQuantiles(df, keyCols, valueCol, tiebreakCols, Seq(0.25, 0.5, 0.75))
      .groupBy(keyCols.map(col): _*)
      .agg(
        max(when(col("q") === 0.25, col("value"))).as("__p25"),
        max(when(col("q") === 0.5, col("value"))).as("__med"),
        max(when(col("q") === 0.75, col("value"))).as("__p75"))
    df.join(broadcast(stats), keyCols)
      .withColumn(as, when(col("__p75") - col("__p25") =!= 0.0,
        (col(valueCol) - col("__med")) / (col("__p75") - col("__p25"))))
      .drop("__p25", "__med", "__p75")
  }
}
