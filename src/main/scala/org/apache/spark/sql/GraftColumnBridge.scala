package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the private[sql] Column ↔ Expression converters so graft's
  * native Catalyst expressions can expose a public Column API on
  * Spark 4 (where `new Column(expr)` / `col.expr` are no longer
  * public). Shim-only — no Spark internals are modified.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
