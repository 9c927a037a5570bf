package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column↔Expression converters, so graft's
  * native Catalyst expressions can be exposed as plain `Column`s. Spark 4
  * removed the public `new Column(expr)` constructor; placing this shim
  * inside the `org.apache.spark.sql` package is the standard extension
  * idiom for libraries that ship custom expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
