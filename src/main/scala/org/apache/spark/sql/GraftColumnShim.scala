package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression converters so
  * graft's native expressions (e.g. `VecDot`) can be used as Columns on
  * ANY session, registered extensions or not. The standard extension
  * pattern: one accessor file inside the `org.apache.spark.sql`
  * namespace, nothing else.
  */
object GraftColumnShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
