package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's `private[sql]` Column ↔ Expression
  * conversions (Spark 4 removed the public `new Column(expr)` /
  * `col.expr` surface in favor of ColumnNode). This is the standard
  * extension-library pattern: one tiny file in the `org.apache.spark.sql`
  * namespace, everything else stays in the graft packages.
  */
object GraftBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
