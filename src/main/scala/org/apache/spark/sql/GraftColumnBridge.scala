package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the sql-private Column↔Expression converters so graft
  * can expose custom Catalyst expressions (e.g. LongArrayDot) as
  * regular Columns. Same technique used by Spark-extension libraries
  * (Delta, Qbeast, ...) for the Spark 4 Column/ColumnNode API.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
