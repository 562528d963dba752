package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4's `Column` wraps a `ColumnNode`, not an `Expression`; the
  * converters live behind `private[sql]`. This bridge (in an
  * `org.apache.spark.sql` subpackage, the standard extension pattern) is the
  * single place graft touches that boundary, used to expose the custom
  * Catalyst expressions in [[graft.functions]] as user-facing `Column`s.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
