package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.classic

/** Re-bind a DataFrame's logical plan to a sibling session (a
  * `newSession()` twin sharing the SparkContext) so per-query conf
  * overrides — e.g. the runtime bloom-filter size caps lifted during
  * `graft.operators.Bloom.build` — can be scoped to that session
  * instead of mutating the caller's shared conf, where a concurrent
  * query would observe them and an interleaved restore could leave the
  * wrong value behind. Lives under the spark.sql namespace for the
  * same reason as [[ColumnBridge]]: `Dataset.ofRows` is private[sql].
  */
object SessionBridge {
  def inSession(df: DataFrame, spark: SparkSession): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession],
      df.queryExecution.logical)
}
