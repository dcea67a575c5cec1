package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the most recent right row with
  * `right.ts <= left.ts` within the same key — the canonical
  * time-series enrichment operator Spark lacks natively.
  *
  * Implemented by composition (preference (a) of the extension
  * ladder — no custom physical operator needed): tag and union both
  * sides, then one window pass per key ordered by (ts, side) carries
  * the latest right payload forward via `last(ignoreNulls)`. Right rows
  * sort before left rows at equal timestamps, so ties are inclusive —
  * matching DuckDB's native ASOF JOIN, which the oracle uses.
  *
  * Scale shape: ONE shuffle on the key (same as any keyed window), no
  * range-join explosion, no per-key collect. Skewed keys ride AQE.
  * State is a single carried value per partition-ordered scan.
  */
object AsOfJoin {

  /** @param left      left rows
    * @param right     right rows
    * @param keys      equi-join key column names (present both sides)
    * @param tsCol     ordering column name (present both sides; any
    *                  orderable type — use epoch longs for cross-engine
    *                  determinism)
    * @param rightCols right payload columns to carry (renamed as-is in
    *                  the output)
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           tsCol: String, rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // common layout: keys ++ ts ++ side ++ left payload ++ right payload
    val lNorm = left
      .withColumn("__side", lit(1))
      .select((keys.map(col) :+ col(tsCol) :+ col("__side")) ++
        leftCols.filterNot(c => keys.contains(c) || c == tsCol).map(col) ++
        rightCols.map(c => lit(null).as(s"__r_$c")): _*)
    val rNorm = right
      .withColumn("__side", lit(0))
      .select((keys.map(col) :+ col(tsCol) :+ col("__side")) ++
        leftCols.filterNot(c => keys.contains(c) || c == tsCol)
          .map(c => lit(null).as(c)) ++
        rightCols.map(c => col(c).as(s"__r_$c")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(lNorm.unionByName(rNorm)) { (d, c) =>
      d.withColumn(s"__asof_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select((keys.map(col) :+ col(tsCol)) ++
        leftCols.filterNot(c => keys.contains(c) || c == tsCol).map(col) ++
        rightCols.map(c => col(s"__asof_$c").as(s"r_$c")): _*)
  }
}
