package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Narrow accessor for graft's `private[sql]` seams — the
  * Column⇄Expression bridge (GeoRules' marker Column, the rewritten
  * predicate, VectorOps' native dot/norm2) and the live session's
  * FunctionRegistry (idempotent installs on sessions graft did not
  * build). This is the standard extension-library technique; no Spark
  * internals are modified. Keep ALL private[sql] access in this one
  * file so the exposure stays auditable.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def functionRegistry(spark: SparkSession)
      : catalyst.analysis.FunctionRegistry =
    spark.sessionState.functionRegistry

  /** Pin a (possibly sort-)column's null ordering to NULLS LAST at
    * the ColumnNode level (r16, used by DistributedRank/PrefixSum's
    * RDD-boundary orderings — NULL_CONTRACT.md). A Column's sort
    * state is an `internal.SortOrder` COLUMN NODE, not a catalyst
    * SortOrder: converting via [[expression]] and pattern-matching
    * catalyst yields a `ColumnNodeExpression` wrapper that matches
    * nothing, and re-sorting it NESTS sort orders (the evaluated
    * inner node then throws `Cannot evaluate expression: ... ASC
    * NULLS FIRST`). A non-sort column becomes ASC NULLS LAST.
    */
  def nullsLast(c: Column): Column = c.node match {
    case so: internal.SortOrder =>
      Column(so.copy(nullOrdering = internal.SortOrder.NullsLast))
    case other =>
      Column(internal.SortOrder(other, internal.SortOrder.Ascending,
        internal.SortOrder.NullsLast))
  }
}
