package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series resampling with last-observation-carried-forward — the
  * gap-filling operator that turns an irregular event stream into the
  * fixed-interval series a feature pipeline consumes.
  *
  * Composition (extension-ladder preference (a)): per-key min/max
  * bounds → native `sequence()` explode generates each key's tick grid
  * (no driver loop, no cross join against a global calendar) → the
  * grid as-of-joins the observations ([[AsOfJoin]] backward carry, one
  * keyed shuffle).
  *
  * Scale shape: grid size is (key's time range / step) rows per key —
  * generated distributed, keyed like the observations, so the carry
  * join shuffles grid+events once on the key. A global-calendar cross
  * join would generate keys × full-range ticks instead; per-key bounds
  * prune empty history automatically.
  *
  * Ticks are multiples of `stepUs`, from the key's first observation
  * aligned DOWN to its last aligned UP (so every observation falls at
  * or before some tick and is carried at least once). Alignment is
  * FLOOR division on epoch-micros longs — Spark's `div` truncates
  * toward zero, which for negative (pre-1970) timestamps would align
  * the first tick UP instead of down and diverge from both this
  * contract and the DuckDB oracle's `//`; the explicit remainder
  * correction below restores floor/ceil semantics on all inputs.
  */
object Resample {

  /** @param events   observations: keyCols ++ (tsCol: long micros) ++ payload
    * @param keys     series identity columns
    * @param tsCol    epoch-micros long column
    * @param payload  columns carried forward onto each tick (as `r_<c>`;
    *                 lead with a unique tiebreaker for determinism)
    * @param stepUs   tick width in microseconds
    */
  def resampleLocf(events: DataFrame, keys: Seq[String], tsCol: String,
                   payload: Seq[String], stepUs: Long): DataFrame = {
    require(stepUs > 0, s"tick width must be positive, got $stepUs")
    val bounds = events.groupBy(keys.map(col): _*)
      .agg(min(col(tsCol)).as("__lo"), max(col(tsCol)).as("__hi"))
    // `div` = exact integer division (Column./ on longs is double math —
    // lossy above 2^53) but truncates toward zero; the CASE terms turn
    // it into floor (lo) / ceil (hi) division so negative epoch-micros
    // align down/up exactly like the oracle's `//`. stepUs > 0, so the
    // remainder's sign is the dividend's: < 0 only when the dividend is
    // negative and non-multiple (floor needs −1), > 0 only when positive
    // and non-multiple (ceil needs +1).
    val grid = bounds.select(
      keys.map(col) :+
        explode(sequence(
          expr(s"((__lo div ${stepUs}L) - (CASE WHEN __lo % ${stepUs}L < 0" +
            s" THEN 1 ELSE 0 END)) * ${stepUs}L"),
          expr(s"((__hi div ${stepUs}L) + (CASE WHEN __hi % ${stepUs}L > 0" +
            s" THEN 1 ELSE 0 END)) * ${stepUs}L"),
          lit(stepUs))).as(tsCol): _*)
    AsOfJoin.asof(grid, events, keys, tsCol, payload)
  }
}
