package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cross-engine-exact numeric helpers.
  *
  * The driver's correctness gate hash-compares our result values
  * against DuckDB's. A plain `sum(double)` is order-dependent in the
  * last ulp, so any shuffle-order difference (or engine difference)
  * breaks the hash. Routing the aggregation through decimals makes it
  * exact and associative: `double → decimal(18,s)` rounds to the same
  * decimal in both engines (the inputs are generated with ≤2 decimal
  * digits, far from tie boundaries), the decimal sum is exact, and the
  * final `decimal → double` cast is deterministic. Per-row double
  * arithmetic (e.g. `a * (1-b)` both computed as doubles) is IEEE-754
  * deterministic and safe without this detour.
  *
  * At scale this costs nothing material: decimal sums still get
  * map-side partial aggregation and whole-stage codegen.
  */
object Exact {
  def dec(c: Column, scale: Int = 2): Column = c.cast(DecimalType(18, scale))

  /** Exact sum of a double column, returned as double. */
  def dsum(c: Column, scale: Int = 2): Column = sum(dec(c, scale)).cast(DoubleType)

  /** Exact average of a double column, returned as double
    * (exact decimal sum, then one double division — both engines
    * divide the same two doubles).
    */
  def davg(c: Column, scale: Int = 2): Column =
    sum(dec(c, scale)).cast(DoubleType) / count(c).cast(DoubleType)

  /** Exact discounted-revenue sum: SUM(dec(price) * (1 - dec(disc))),
    * returned as double — lives here (with its SQL twin below) so the
    * Spark and oracle spellings cannot drift apart across call sites.
    */
  def dsumDisc(price: Column, disc: Column): Column =
    sum(dec(price) * (lit(1) - dec(disc))).cast(DoubleType)

  /** DuckDB SQL spellings of the same helpers, for oracle strings. */
  def sqlDec(e: String, scale: Int = 2): String = s"CAST($e AS DECIMAL(18,$scale))"
  def sqlDsum(e: String, scale: Int = 2): String =
    s"CAST(SUM(${sqlDec(e, scale)}) AS DOUBLE)"
  def sqlDavg(e: String, scale: Int = 2): String =
    s"CAST(SUM(${sqlDec(e, scale)}) AS DOUBLE) / CAST(COUNT($e) AS DOUBLE)"
  def sqlDsumDisc(price: String, disc: String): String =
    s"CAST(SUM(${sqlDec(price)} * (1 - ${sqlDec(disc)})) AS DOUBLE)"
}
