package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal interop shim: Spark 4 made the Column<->Expression bridge
  * private[sql]; extension libraries need it to expose native Catalyst
  * expressions through the public Column API. This file intentionally
  * lives in the org.apache.spark.sql package for that access and
  * contains nothing else. */
object GraftInterop {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
