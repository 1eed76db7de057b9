package org.apache.spark.sql.graftops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made these conversions
  * private[sql] (`org.apache.spark.sql.classic.ExpressionUtils`); a
  * child package of org.apache.spark.sql is the standard way for an
  * extension library to reach them (same technique as spark-packages
  * published connectors use for internal APIs).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
