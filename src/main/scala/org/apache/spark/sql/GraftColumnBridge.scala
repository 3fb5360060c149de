package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column <-> Expression conversions
  * (`org.apache.spark.sql.classic.ExpressionUtils`) so graft's native
  * Catalyst expressions can be exposed as user-facing `Column`s. Lives in
  * the `org.apache.spark.sql` package solely for access; no Spark
  * internals are modified.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
