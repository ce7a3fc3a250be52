package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column<->Expression converters.
  *
  * Spark 4.x made `Column.apply(Expression)` and `Column.expr`
  * `private[spark]`; the sanctioned escape hatch for libraries that
  * define custom Catalyst expressions is `classic.ExpressionUtils`,
  * which is `private[sql]` — reachable only from a source file compiled
  * into the `org.apache.spark.sql` package. This object is that file:
  * two forwarding methods, nothing else.
  */
object GraftShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Fully CONVERT a Column's node tree to a catalyst expression —
    * unlike [[expression]] (a lazy adapter that codegen chokes on
    * when the tree holds `UnresolvedFunction` Column nodes, e.g. any
    * tree built with `org.apache.spark.sql.functions`), the converter
    * rewrites every node into the analyzer-resolvable catalyst form.
    * Required by function-registry builders that expand to
    * Column-API compositions.
    */
  def toResolvableExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Register a SQL function on a LIVE session (the post-hoc twin of
    * `SparkSessionExtensions.injectFunction`, for sessions the caller
    * didn't build — e.g. the driver gate's). `sessionState` is
    * `private[sql]`, hence the forwarder lives here.
    */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      new org.apache.spark.sql.catalyst.FunctionIdentifier(name),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", name),
      builder)
}
