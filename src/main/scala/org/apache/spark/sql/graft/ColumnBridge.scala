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

  /** Register the graft SQL functions on a RUNNING session (the
    * `spark.sql.extensions=graft.GraftExtensions` config only applies at
    * session build time).
    */
  def registerFunctions(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    graft.GraftExtensions.all.foreach { case (name, info, builder) =>
      registry.registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name), info,
        builder)
    }
  }
}
