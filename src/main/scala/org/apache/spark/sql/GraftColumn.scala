package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column-from-Expression factory. Spark 4
  * moved Column construction behind `classic.ExpressionUtils`; extensions
  * that build Catalyst expressions directly (constant-folded literals,
  * custom expressions) need this one-liner shim in the sql package.
  */
object GraftColumn {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
