package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 removed `Column.expr` from the
  * public API (Connect compatibility); the classic bridge is
  * `private[sql]`, so this one-file shim lives in the sql package
  * namespace — the standard technique for libraries that add native
  * Catalyst expressions on the classic engine. */
object ColumnBridge {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
