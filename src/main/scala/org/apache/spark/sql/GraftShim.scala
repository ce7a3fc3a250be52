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
}
