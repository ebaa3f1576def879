package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `sql`-private Column constructor so graft can use its
  * native Catalyst expressions as Columns without requiring the session to
  * have GraftExtensions registered (important for code paths a host
  * application may run in its own SparkSession).
  */
object GraftColumn {
  def of(e: Expression): Column = classic.ExpressionUtils.column(e)
  def exprOf(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
