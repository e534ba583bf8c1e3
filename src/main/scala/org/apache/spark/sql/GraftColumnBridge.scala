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
}
