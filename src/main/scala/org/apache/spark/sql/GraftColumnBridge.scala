package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to the classic Column ⇄ Expression converters,
  * which are `private[sql]` in Spark 4 (Column is a ColumnNode facade
  * since the Connect unification). This is the supported conversion
  * path — we only re-export it for graft's custom expressions.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
