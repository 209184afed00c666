package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 `Column`s wrap connect-compatible `ColumnNode`s rather than
  * Catalyst expressions; custom-Expression libraries need the classic
  * converters, which are `private[sql]`. Minimal bridge for graft. */
object GraftColumns {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
