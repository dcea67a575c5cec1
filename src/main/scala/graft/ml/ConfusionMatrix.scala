package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** M7 — distributed confusion-matrix evaluation. The reference pulls
  * the whole scored test set to pandas and masks booleans
  * (MLPCModel-3.py:382-401); here the 2×2 cells come from one grouped
  * count (map-side combinable, four rows collected) and the scalar
  * metric math runs on the driver. Zero-denominator → 0.0, matching
  * the reference's ZeroDivisionError handler.
  */
object ConfusionMatrix {

  final case class Metrics(tp: Long, fp: Long, tn: Long, fn: Long,
                           ppv: Double, npv: Double, sensitivity: Double,
                           specificity: Double, accuracy: Double)

  private def ratio(num: Long, den: Long): Double =
    if (den == 0L) 0.0 else num.toDouble / den.toDouble

  /** Metric math over already-aggregated (label=positive?, pred=positive?)
    * cell counts — shared by [[compute]] and callers that memoize the
    * 4 collected cells to avoid refitting the model per metric query.
    */
  def fromCells(cells: Map[(Boolean, Boolean), Long]): Metrics = {
    val c = cells.withDefaultValue(0L)
    val (tp, fn, fp, tn) =
      (c((true, true)), c((true, false)), c((false, true)), c((false, false)))
    Metrics(tp, fp, tn, fn,
      ppv = ratio(tp, tp + fp), npv = ratio(tn, tn + fn),
      sensitivity = ratio(tp, tp + fn), specificity = ratio(tn, tn + fp),
      accuracy = ratio(tp + tn, tp + tn + fp + fn))
  }

  /** `positive` is the label value treated as the positive class. */
  def compute(scored: DataFrame, labelCol: String, predCol: String,
              positive: String): Metrics =
    fromCells(scored.groupBy(col(labelCol).as("l"), col(predCol).as("p"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0) == positive, r.getString(1) == positive) -> r.getLong(2))
      .toMap)

  /** The 2×2 cells as a DataFrame (for oracle-style inspection). */
  def cells(scored: DataFrame, labelCol: String, predCol: String): DataFrame =
    scored.groupBy(col(labelCol), col(predCol))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col(labelCol), col(predCol))
}
