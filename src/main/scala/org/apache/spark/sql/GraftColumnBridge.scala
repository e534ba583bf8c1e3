package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Narrow accessor for the `private[sql]` Column⇄Expression bridge —
  * required by graft.plans.GeoRules to build its marker Column and to
  * assemble the rewritten predicate from Column-level math. This is
  * the standard extension-library technique; no Spark internals are
  * modified.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
