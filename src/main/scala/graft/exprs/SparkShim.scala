package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for the graft engine's native expressions.
  * Spark 4 made these converters `private[sql]`; extension libraries
  * bridge them from inside the package (the conventional pattern for
  * Catalyst-extension projects).
  */
object GraftShim {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
