package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 routes Column through the
  * connect-compatible ColumnNode layer and marks the classic-backend
  * converters `private[sql]`; this shim (in the sql package tree — the
  * conventional extension point, NOT a fork) re-exports the two
  * conversions the graft custom expressions need.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
