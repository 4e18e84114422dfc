package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4 made `Column` implementation-agnostic (it wraps a ColumnNode,
  * not an Expression) and scoped the classic converters `private[sql]`;
  * this shim — compiled into the sql package, the conventional extension
  * point for libraries shipping custom expressions — re-exposes exactly
  * the two conversions needed to use a custom [[Expression]] from the
  * public DataFrame API.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
