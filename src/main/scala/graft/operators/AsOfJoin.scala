package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the nearest right row at-or-before
  * (`backward`, default) or at-or-after (`forward`) its timestamp
  * within the same key, optionally within a `tolerance` — the full
  * pandas-merge_asof surface, which Spark lacks natively.
  *
  * Implemented by composition (preference (a) of the extension
  * ladder — no custom physical operator needed): tag and union both
  * sides, then one window pass per key ordered by (ts, side) carries
  * the nearest right payload via `last(ignoreNulls)` (the forward
  * direction simply reverses the ordering). Right rows sort before
  * left rows at equal timestamps, so ties are inclusive — matching
  * DuckDB's native ASOF JOIN, which the oracle uses.
  *
  * Scale shape: ONE shuffle on the key (same as any keyed window), no
  * range-join explosion, no per-key collect — the tolerance is a
  * post-carry filter, not a join condition, so it cannot explode
  * either. Skewed keys ride AQE. State is a single carried value per
  * partition-ordered scan.
  */
object AsOfJoin {

  /** @param left      left rows
    * @param right     right rows
    * @param keys      equi-join key column names (present both sides)
    * @param tsCol     ordering column name (present both sides; any
    *                  orderable type — use epoch longs for cross-engine
    *                  determinism; must be numeric when `tolerance` is
    *                  set)
    * @param rightCols right payload columns to carry (renamed `r_<c>`
    *                  in the output)
    * @param direction `"backward"` (nearest right.ts <= left.ts) or
    *                  `"forward"` (nearest right.ts >= left.ts)
    * @param tolerance max |left.ts − right.ts| in `tsCol` units; a
    *                  carried match farther away yields nulls (no match)
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           tsCol: String, rightCols: Seq[String],
           direction: String = "backward",
           tolerance: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val leftCols = left.columns.toSeq
    // the right payload rides as ONE struct so the carried match is an
    // atomic right row — per-column last(ignoreNulls) would substitute
    // stale values for NULL fields and emit a row that never existed.
    // The right ts leads the struct (needed for the tolerance check; at
    // carry-time ties it is equal, so payload still breaks ties).
    val rStructType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__rts", right.schema(tsCol).dataType) +:
        rightCols.map(c =>
          org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))
    val lNorm = left
      .withColumn("__side", lit(1))
      .select((keys.map(col) :+ col(tsCol) :+ col("__side")) ++
        leftCols.filterNot(c => keys.contains(c) || c == tsCol).map(col) :+
        lit(null).cast(rStructType).as("__r"): _*)
    val rNorm = right
      .withColumn("__side", lit(0))
      .select((keys.map(col) :+ col(tsCol) :+ col("__side")) ++
        leftCols.filterNot(c => keys.contains(c) || c == tsCol)
          .map(c => lit(null).as(c)) :+
        struct(col(tsCol).as("__rts") +: rightCols.map(col): _*).as("__r"): _*)

    // ties among right rows at equal (key, ts) are broken by the
    // greatest payload struct — deterministic across runs (a native
    // ASOF picks arbitrarily; callers needing a specific pick should
    // include a tiebreaker column in rightCols first)
    val ts = if (direction == "backward") col(tsCol).asc else col(tsCol).desc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ts, col("__side"), col("__r").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lNorm.unionByName(rNorm)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
    val withinTol = tolerance match {
      case None => lit(true)
      case Some(t) if direction == "backward" =>
        col("__asof.__rts") >= col(tsCol) - lit(t)
      case Some(t) =>
        col("__asof.__rts") <= col(tsCol) + lit(t)
    }
    carried.filter(col("__side") === 1)
      .select((keys.map(col) :+ col(tsCol)) ++
        leftCols.filterNot(c => keys.contains(c) || c == tsCol).map(col) ++
        rightCols.map(c =>
          when(withinTol, col(s"__asof.$c")).as(s"r_$c")): _*)
  }
}
