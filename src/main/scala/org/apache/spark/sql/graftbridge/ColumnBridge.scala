package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column↔Expression conversion private[sql]
  * (ExpressionUtils in columnNodeSupport.scala). This bridge lives inside
  * the sql package tree to re-expose exactly those two conversions for
  * graft's native Catalyst expressions — no other internals touched.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
