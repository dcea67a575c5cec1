package graft.operators

import graft.functions.TopKStructs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group top-k without a window (the k-generalization of a11's
  * argmax; see [[graft.functions.TopKStructs]] for the shuffle math).
  * Output matches the rank-window formulation row-for-row when
  * `sortCols` ends in a unique tiebreaker: keys, rn (1..k), then the
  * remaining columns.
  */
object GroupTopK {

  def topKPerGroup(df: DataFrame, keys: Seq[String], sortCols: Seq[String],
                   k: Int, descending: Boolean = false): DataFrame = {
    val rest = df.columns.toSeq.filterNot(c => keys.contains(c) || sortCols.contains(c))
    val fields = sortCols ++ rest
    val packed = struct(fields.map(col): _*)
    val agg = df.groupBy(keys.map(col): _*)
      .agg(TopKStructs.top_k_structs(packed, k, descending).as("__top"))
    val exploded = agg.select(
      keys.map(col) :+ posexplode(col("__top")).as(Seq("__pos", "__row")): _*)
    exploded.select(
      keys.map(col) ++ Seq((col("__pos") + 1).cast("int").as("rn")) ++
        fields.map(f => col(s"__row.$f").as(f)): _*)
  }
}
