package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for native Catalyst extensions: Column <-> Expression conversion
  * is `private[sql]` in Spark 4 (`classic.ExpressionUtils`), so
  * third-party native expressions expose their Column API through this
  * shim — the standard extension-library pattern (same mechanism Spark
  * connectors use).
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
