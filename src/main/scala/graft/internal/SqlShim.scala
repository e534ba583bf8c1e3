/* Lives inside org.apache.spark.sql so graft can reach two
 * `private[sql]` seams of the classic (non-Connect) API surface:
 * wrapping a Catalyst Expression into a public Column, and the
 * session's FunctionRegistry. Nothing else leaks through — keep this
 * file to these two forwarders so the internal-API exposure stays
 * auditable in one place.
 */
package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object SqlShim {
  /** Public Column over a Catalyst Expression (classic sessions). */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** The Catalyst Expression behind a classic Column. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The live session's function registry (for idempotent installs on
    * sessions graft did not build, e.g. the harness driver's).
    */
  def functionRegistry(spark: SparkSession): FunctionRegistry =
    spark.sessionState.functionRegistry
}
