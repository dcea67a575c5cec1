package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Dynamic pivot: the pivot column's values are discovered at plan time
  * rather than supplied by the caller.
  *
  * Discovery is a driver-side distinct-collect — explicitly documented
  * and bounded, not hidden: pivoting is only meaningful when the pivot
  * cardinality is small (each value becomes an output COLUMN), so the
  * collect is a tiny aggregate (distinct → sort → limit), never a data
  * copy. `maxValues` fails fast if the column is too wide to pivot —
  * at 100 TB an unbounded pivot on a high-cardinality key would
  * otherwise OOM the driver AND produce an unusable million-column
  * schema. Values are sorted so the output schema is deterministic
  * across runs and engines.
  */
object Pivots {

  def dynamicPivot(df: DataFrame, groupCols: Seq[String], pivotCol: String,
                   agg: Column, maxValues: Int = 1000): DataFrame = {
    val values = df.select(col(pivotCol)).distinct()
      .orderBy(col(pivotCol)).limit(maxValues + 1)
      .collect().map(_.get(0)).toSeq
    require(values.length <= maxValues,
      s"pivot column $pivotCol exceeds $maxValues distinct values; " +
        "pivot output columns would be unbounded — aggregate instead")
    df.groupBy(groupCols.map(col): _*).pivot(pivotCol, values).agg(agg)
  }
}
