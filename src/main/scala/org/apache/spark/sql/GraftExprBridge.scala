package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 made the Column ↔ catalyst Expression bridge
  * (`classic.ExpressionUtils`) private[sql]; custom Expressions
  * (graft.rag.DotProduct) need it, so this shim lives in the sql
  * package — the standard pattern for Catalyst extensions compiled
  * against the classic runtime.
  */
object GraftExprBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
