package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Accessor for the `private[sql]` Column⇄Expression conversions — lets
  * library-boundary helpers (Tables.dsum2/dsum4) build a Column around a
  * graft Catalyst expression DIRECTLY, so they work in any session,
  * including ones created WITHOUT `spark.sql.extensions=graft.
  * GraftExtensions` (the driver's bare spark-shell smoke constructs its
  * own session; a call_function route would fail to resolve there).
  * Lives in the org.apache.spark.sql package solely to satisfy the
  * access modifier; no Spark behavior is altered.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
