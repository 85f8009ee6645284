package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4 removed the public `Column(Expression)` constructor (Columns
  * are ColumnNode-based now); the conversion lives in
  * `sql.classic.ExpressionUtils`, which is `private[sql]`. This shim is
  * declared inside the `org.apache.spark.sql` package tree purely to
  * re-export those two conversions to the engine — it touches no Spark
  * internals beyond that documented pair.
  */
object Bridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
