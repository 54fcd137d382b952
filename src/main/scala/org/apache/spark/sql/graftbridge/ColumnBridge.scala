package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Classic-API bridge between `Column` and Catalyst `Expression`.
  *
  * Spark 4 removed the public `new Column(expr)` / `col.expr` surface
  * (Connect refactor); the classic conversions live in `private[sql]`
  * `ExpressionUtils`. This shim re-exports them from an `org.apache.spark
  * .sql` subpackage — the standard pattern for extension libraries that
  * define native expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
