package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 moved `Column` to sql-api and
  * made the expression accessors `private[sql]`; custom Catalyst
  * expressions (graft.functions.DotProduct) still need the hop, so
  * this one-file shim lives under the spark.sql package namespace.
  * Public API surface used: none beyond what any SparkSessionExtensions
  * implementation relies on.
  */
object ColumnBridge {
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
}
