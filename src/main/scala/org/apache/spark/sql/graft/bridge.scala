package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` surface: Column ⇄ Expression conversion for
  * registering custom Catalyst expressions as Columns. This is the same
  * mechanism third-party Spark extension libraries use; the underlying
  * calls are stable across the 4.x classic API.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
