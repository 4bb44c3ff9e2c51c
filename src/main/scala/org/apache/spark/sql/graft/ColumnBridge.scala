package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 hides the classic converters
  * behind `private[sql]`, so library code constructing custom Catalyst
  * expressions directly (graft.plans.*) goes through this in-package
  * shim — the same technique every Spark-native extension library uses.
  * No Spark internals are modified; this only re-exports two converters.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
