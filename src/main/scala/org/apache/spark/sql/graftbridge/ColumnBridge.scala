package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4's Column wraps a ColumnNode and the Catalyst bridge
  * (classic.ExpressionUtils) is private[sql]; this shim, compiled inside
  * the sql package namespace, re-exports the two conversions custom
  * Expressions need. No Spark internals are copied or altered.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
