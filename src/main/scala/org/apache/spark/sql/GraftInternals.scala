package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the sql-private Column↔Expression converters (they are
  * `private[sql]` in Scala signature only — stable public bytecode).
  * Confined to this one file so the rest of the engine stays on public
  * API.
  */
object GraftInternals {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
