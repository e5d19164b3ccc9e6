package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters — the
  * standard mechanism for libraries that ship native Catalyst expressions
  * (the public API deliberately hides Expression since Spark Connect). */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eagerly-converted expression. [[expression]] returns a lazy
    * `ColumnNodeExpression` wrapper that reports `NullType` until the
    * classic Dataset path converts it — fine inside `select`/`withColumn`,
    * but an expression returned from a `FunctionRegistry` builder into a
    * SQL plan is never converted, so a UDF registered that way would
    * silently type as VOID. This runs the converter up front. */
  def resolvedExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)
}
