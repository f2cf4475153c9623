package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column ↔ Expression conversion `private[sql]`
  * (ExpressionUtils). Custom Catalyst expressions still need it to be
  * exposed as user-facing Columns, so this one-file bridge lives in an
  * `org.apache.spark.sql` subpackage. No Spark internals are modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
