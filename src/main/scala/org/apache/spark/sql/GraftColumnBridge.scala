package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column <-> Expression converters so graft
  * can build Columns from its custom Catalyst expressions. This is the
  * standard pattern for Spark-native libraries that add expressions without
  * forking Spark (the converters are stable across the 4.x classic API).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
