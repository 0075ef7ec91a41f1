package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made the Column <-> catalyst Expression bridge `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`). This object lives under
  * the sql package namespace purely to re-expose the two converters to the
  * graft library — the public-code pattern for registering custom Catalyst
  * expressions as Columns. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
