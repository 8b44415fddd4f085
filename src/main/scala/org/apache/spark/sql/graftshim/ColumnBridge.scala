package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge for graft's native kernels.
  *
  * Spark 4 made `Column` wrap an opaque `ColumnNode` and scoped the
  * converter (`classic.ExpressionUtils`) `private[sql]`, so an extension
  * library that composes a custom `Expression` over an arbitrary caller
  * `Column` (not just a named column it can reach through a registered
  * SQL function + `expr("f(colname)")`) needs this one-hop shim in an
  * `org.apache.spark.sql` subpackage — the same pattern public Spark
  * extension libraries use for typed/extension columns. Nothing here is
  * copied from Spark; it only re-exports the two conversions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
