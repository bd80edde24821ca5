package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for constructing `Column`s from custom Catalyst expressions:
  * Spark 4 moved the Column<->Expression conversions behind
  * `private[sql] classic.ExpressionUtils`, so the (tiny) accessor has
  * to live in the `org.apache.spark.sql` package.
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
