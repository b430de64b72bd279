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

  /** The data filters a file scan could NOT translate into source
    * filters — `translateFilter` is the exact function
    * `FileSourceScanLike.pushedDownFilters` maps with (that member is
    * `protected`, hence this bridge), so the difference is the
    * untranslatable count (ADVICE r13: replaces string-parsing the
    * `PushedFilters` metadata, which miscounted on values containing
    * parens or commas).
    */
  def unpushedScanFilters(
      scan: org.apache.spark.sql.execution.FileSourceScanExec): Int = {
    import org.apache.spark.sql.execution.datasources.{DataSourceStrategy, DataSourceUtils}
    val nested = DataSourceUtils.supportNestedPredicatePushdown(scan.relation)
    scan.dataFilters.size -
      scan.dataFilters.flatMap(DataSourceStrategy.translateFilter(_, nested)).size
  }

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
