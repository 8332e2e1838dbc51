package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` classic Column↔Expression converters —
  * the supported way for libraries to expose custom Catalyst expressions
  * as `Column`s on Spark 4's split API (the old `new Column(expr)` ctor is
  * gone from the unified `sql.Column`).
  */
object graftbridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
