package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between Catalyst `Expression`s and the public `Column` API.
  *
  * Spark 4 moved `Column` onto `ColumnNode`; the Expression<->Column
  * converters live in `org.apache.spark.sql.classic.ExpressionUtils` and are
  * `private[sql]`. Graft defines custom Catalyst expressions (codegen'd
  * scalar/agg functions — see graft.functions), so it needs this one-file
  * shim inside the `org.apache.spark.sql` package space. No Spark behavior
  * is modified.
  */
object GraftShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
