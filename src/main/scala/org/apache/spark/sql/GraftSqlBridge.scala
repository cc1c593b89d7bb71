package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the `private[sql]` Column <-> Expression
  * converters — the standard pattern for third-party Catalyst
  * expressions on Spark 4 (the classic converters are package
  * private). Nothing else from the internal API is touched.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
