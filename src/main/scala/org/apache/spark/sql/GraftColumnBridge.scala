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
  /** Build a DataFrame from an RDD of catalyst [[InternalRow]]s
    * without the external-Row round trip (r18, the DistributedRank/
    * PrefixSum scale-path rewrite): `createDataFrame(RDD[Row])` pays
    * a full RowEncoder serialization per row, while the physical scan
    * of this form (`RDDScanExec`) applies one codegen'd
    * UnsafeProjection — rows may be [[JoinedRow]]/GenericInternalRow
    * wrappers consumed element-wise, no copies needed.
    */
  def internalCreateDataFrame(
      spark: SparkSession,
      catalystRows: org.apache.spark.rdd.RDD[catalyst.InternalRow],
      schema: types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(catalystRows, schema)

  def nullsLast(c: Column): Column = c.node match {
    case so: internal.SortOrder =>
      Column(so.copy(nullOrdering = internal.SortOrder.NullsLast))
    case other =>
      Column(internal.SortOrder(other, internal.SortOrder.Ascending,
        internal.SortOrder.NullsLast))
  }
}
