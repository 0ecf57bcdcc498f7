package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark 4's `private[sql]` Column↔Expression converters so
  * graft's custom Catalyst expressions can be exposed as `Column`s.
  * Lives in the org.apache.spark.sql package for access; contains no
  * logic of its own.
  */
object GraftShims {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
