package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` surface needed to expose custom
  * Catalyst expressions as Columns in Spark 4.x (where Column wraps a
  * ColumnNode, not an Expression). Lives in the sql package by necessity;
  * the engine's own code stays in graft.*.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
