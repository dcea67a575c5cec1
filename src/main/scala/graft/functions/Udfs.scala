package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** The UDF escape hatch (SURVEY.md §2.10). Every reference UDF (C5–C10)
  * is implemented natively in [[graft.transform.Cleansers]] — that is
  * the engine's hot path, because a black-box UDF blocks predicate
  * pushdown and column pruning past it and exits whole-stage codegen.
  * This object proves the *surface* exists for genuinely opaque logic:
  * Scala UDFs (one JVM call per row, no Python-worker hop — already
  * ~100× cheaper than the reference's PySpark UDFs) plus SQL-text
  * registration. UdfSurfaceSpec pins the parity with the native path
  * AND the pushdown penalty, so the cost stays documented.
  */
object Udfs {

  /** Reference C5 (strip trailing '%'), as a UDF — parity-tested
    * against the native `Cleansers.stripPercent`.
    */
  val stripPercentUdf: UserDefinedFunction =
    udf((s: String) => if (s == null) null else s.reverse.dropWhile(_ == '%').reverse)

  /** SQL-text registration (`SELECT strip_percent(col) …`) — the
    * surface the reference abandoned (commented-out
    * sqlContext.udf.register, loanStat-DataproctoBQ.py:245).
    */
  def register(spark: SparkSession): Unit =
    spark.udf.register("strip_percent", stripPercentUdf)
}
