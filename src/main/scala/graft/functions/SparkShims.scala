package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge for custom Catalyst expressions → `Column` (and back). Spark
  * 4.1.2 made the converters `private[sql]` (`classic.ExpressionUtils`),
  * so third-party expression libraries host this one-liner inside the
  * `org.apache.spark.sql` package namespace — the standard extension
  * pattern for Spark-native function libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
