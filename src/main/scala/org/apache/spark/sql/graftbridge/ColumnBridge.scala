package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's private[sql] Expression↔Column converters (Spark 4.x
  * wraps Column around ColumnNode; ExpressionUtils is the supported internal
  * conversion). Lives under org.apache.spark.sql so the private[sql] scope
  * is visible; keep this the ONLY file that needs it.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
