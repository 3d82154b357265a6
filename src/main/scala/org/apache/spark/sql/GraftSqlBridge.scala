package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the package-private Column↔Expression conversion of the
  * classic SQL session (Spark 4 backs Column with ColumnNode; custom
  * Catalyst expressions need this hop to surface as user-facing Columns). */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
