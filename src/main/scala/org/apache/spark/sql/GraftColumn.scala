package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for building a [[Column]] from a Catalyst [[Expression]] — the
  * constructor is `private[sql]` in Spark 4, so Spark-native extension
  * libraries expose it through a one-liner in this package (the same
  * pattern used by spatial/ML extension toolkits). This is the only file
  * outside the `graft` namespace.
  */
object GraftColumn {
  def apply(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expr(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
