package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the sql-private Column ⇄ Expression converters for the
  * engine's plan-time-parameterized native expressions (e.g.
  * [[graft.functions.CellArgmax]], whose centroid table cannot ride a
  * SQL literal, so the session-extension `call_function` route is not
  * available). `classic.ExpressionUtils` is `private[sql]` at the
  * Scala level only — this object re-exports the two converters from
  * inside the package, the standard extension-point shim. */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
