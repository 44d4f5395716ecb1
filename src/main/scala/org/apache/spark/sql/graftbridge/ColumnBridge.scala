package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's package-private Column<->Expression conversion
  * (org.apache.spark.sql.classic.ExpressionUtils is private[sql] in Spark 4).
  * This is the only place we reach across the package boundary; everything
  * else uses public APIs. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
