package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal accessor for Spark-private Column↔Expression conversion
  * (ExpressionUtils is private[sql] in Spark 4; this bridge lives in the
  * sql package tree solely to expose the two conversions graft's custom
  * Catalyst expressions need). */
object CatalystBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
