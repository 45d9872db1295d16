package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 scopes these conversions
  * `private[sql]` (the public Column wraps a ColumnNode); extension
  * libraries providing native Catalyst expressions reach them from an
  * `org.apache.spark.sql` subpackage — the standard pattern for
  * Catalyst-level extensions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
