package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the package-private Column↔Expression converters (Spark 4
  * hides Column.expr behind the classic module). Same pattern as public
  * Spark extensions (cf. SNIPPETS.md [3], qbeast's DatasetFactory).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
