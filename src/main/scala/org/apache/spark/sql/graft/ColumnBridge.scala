package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Tiny bridge into the `private[sql]` Column <-> Expression converters —
  * the supported way for an external library to surface a custom Catalyst
  * `Expression` as a `Column` without registering a SQL function. Lives in
  * an `org.apache.spark.sql` subpackage solely for access; contains no
  * Spark code.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
