package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's package-private Column↔Expression conversions
  * (`org.apache.spark.sql.classic.ExpressionUtils` is private[sql] in
  * Spark 4.x). This is the standard extension-library pattern for
  * exposing custom Catalyst expressions through the public Column API —
  * the only file that lives inside Spark's namespace, and it contains
  * no logic. */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
