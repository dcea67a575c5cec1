package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Ordered event-sequence analysis per key (funnel / path matching —
  * the clickstream question the reference's batch EDA never reaches,
  * and a staple of training-data curation: "which users completed
  * signup→click→purchase, in order, with anything in between?").
  *
  * Scale design: the naive spelling materializes each key's event-type
  * path as one string/array (unbounded per-key memory) and regex-matches
  * it. This instead runs a subsequence STATE MACHINE over each key's
  * events in order — the same secondary-sort shape as [[Ewma]]: one
  * hash repartition on the key, a spillable per-partition sort, one
  * streaming pass. State per key is a single integer (the furthest
  * funnel stage reached), independent of path length — a billion-event
  * user costs the same memory as a ten-event one.
  */
object Sequences {

  /** Furthest stage of `steps` reached per key as a greedy in-order
    * subsequence match (stage s means steps 0..s-1 all occurred in
    * order; intervening events of other types are ignored). Output:
    * keyCol, stage(int). Rows with null key or null type are excluded.
    *
    * @param orderCols must totally order each key's rows (include a
    *                  unique tiebreak) — ties between different event
    *                  types would otherwise make the match order, and
    *                  the result, nondeterministic.
    */
  def funnelStages(df: DataFrame, keyCol: String, typeCol: String,
                   orderCols: Seq[String], steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val keyField = df.schema(keyCol)
    val outSchema = StructType(Seq(
      keyField, StructField("stage", IntegerType, nullable = false)))
    // the type column is cast to string HERE so non-string event types
    // compare against `steps` instead of throwing at getString
    val prepared = df
      .filter(col(keyCol).isNotNull && col(typeCol).isNotNull)
      .select(((keyCol +: orderCols).map(col) :+
        col(typeCol).cast(StringType).as(typeCol)): _*)
      .repartition(col(keyCol))
      .sortWithinPartitions((keyCol +: orderCols).map(col): _*)
    val typeIdx = 1 + orderCols.length
    val stepsArr = steps.toIndexedSeq
    prepared.mapPartitions { it =>
      val buf = it.buffered
      new Iterator[Row] {
        def hasNext: Boolean = buf.hasNext
        def next(): Row = {
          val first = buf.next()
          val key = first.get(0)
          var stage = 0
          if (stage < stepsArr.length && first.getString(typeIdx) == stepsArr(stage)) stage += 1
          while (buf.hasNext && buf.head.get(0) == key) {
            val t = buf.next().getString(typeIdx)
            if (stage < stepsArr.length && t == stepsArr(stage)) stage += 1
          }
          Row(key, stage)
        }
      }
    }(Encoders.row(outSchema))
  }
}
