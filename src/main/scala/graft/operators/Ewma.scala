package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Exponentially-weighted moving average per key (time-series smoothing
  * the reference's pandas-era EDA would reach for; no Spark built-in).
  *
  * Semantics: rows of a key are visited in `orderCols` order; the
  * accumulator seeds with the FIRST value and then folds
  * `acc = acc * (1-alpha) + x * alpha` — the classic recursive EWMA
  * (adjust=False in pandas terms). Output is one row per key with the
  * final smoothed value and the observation count.
  *
  * Scale design: a window/collect_list spelling would materialize every
  * group as one array (unbounded per-key memory) or pay an interpreted
  * HOF per row. Instead this is the secondary-sort pattern: one hash
  * repartition on the key, a per-partition sort (spillable
  * UnsafeExternalSorter — never driver- or heap-bound), and a single
  * streaming fold over the sorted iterator. State is O(1) per key; a
  * 100 TB events table with billion-row keys streams through without
  * materializing any group.
  *
  * Cross-engine exactness: the fold is a fixed sequence of IEEE-754
  * double ops in a deterministic order, so results are bit-identical to
  * any engine folding the same order (the oracle uses DuckDB
  * `list_reduce` over an identically-ordered `array_agg`). Callers who
  * need that exactness must pass an `alpha` whose complement `1-alpha`
  * is also exactly representable (0.25, 0.5, 0.75, …).
  */
object Ewma {

  /** @param orderCols must make the per-key order total (include a
    *                  unique tiebreak column) or the fold order — and
    *                  therefore the result — is nondeterministic.
    */
  def ewmaLast(df: DataFrame, keyCol: String, valueCol: String,
               orderCols: Seq[String], alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha in (0,1], got $alpha")
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val beta = 1.0 - alpha
    val keyField = df.schema(keyCol)
    val outSchema = StructType(Seq(
      keyField,
      StructField("n_obs", LongType, nullable = false),
      StructField("ewma", DoubleType, nullable = false)))
    // null keys or values have no defined fold position — exclude them
    // (the oracle's array_agg/GROUP BY does the same). The value column
    // is cast to double HERE so int/decimal/float inputs fold correctly
    // instead of throwing ClassCastException at getDouble.
    val prepared = df
      .filter(col(keyCol).isNotNull && col(valueCol).isNotNull)
      .select(((keyCol +: orderCols).map(col) :+
        col(valueCol).cast(DoubleType).as(valueCol)): _*)
      .repartition(col(keyCol))
      .sortWithinPartitions((keyCol +: orderCols).map(col): _*)
    val valueIdx = 1 + orderCols.length
    prepared.mapPartitions { it =>
      val buf = it.buffered
      new Iterator[Row] {
        def hasNext: Boolean = buf.hasNext
        def next(): Row = {
          val first = buf.next()
          val key = first.get(0)
          var acc = first.getDouble(valueIdx)
          var n = 1L
          while (buf.hasNext && buf.head.get(0) == key) {
            acc = acc * beta + buf.next().getDouble(valueIdx) * alpha
            n += 1
          }
          Row(key, n, acc)
        }
      }
    }(Encoders.row(outSchema))
  }
}
