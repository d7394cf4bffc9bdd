package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Access bridge into `private[sql]` Spark internals for the engine's
  * custom Catalyst expressions — the standard pattern for Spark extension
  * libraries (a tiny object inside the org.apache.spark.sql namespace).
  * Keep this file minimal: wrapping/unwrapping Column ↔ Expression only.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
