package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import org.apache.spark.sql.GraftColumnBridge

/** Vector math over `array<float>` embedding columns as ORDERED left
  * folds — one expression per row, no explode/join. A left fold fixes
  * the IEEE addition order, so results are bitwise identical across
  * engines (DuckDB twin: `list_reduce(list_transform(...),
  * (acc, x) -> acc + x)`) — unlike relational SUM, whose accumulation
  * order is nondeterministic, and unlike decimal-snapping, which
  * rounds derived full-precision products differently per engine.
  *
  * Backed by the native codegen expressions in [[VectorExpressions]]
  * (tight primitive loop inside whole-stage codegen); the equivalent
  * `aggregate(zip_with(...))` HOF formulation is kept in
  * [[VectorOps.dotHof]] as the parity witness the spec checks against.
  */
object VectorOps {

  private def col(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    GraftColumnBridge.column(e)

  /** dot(a, b), element-wise double product folded left-to-right. */
  def dot(a: Column, b: Column): Column =
    col(DotProduct(GraftColumnBridge.expression(a),
      GraftColumnBridge.expression(b)))

  /** squared L2 norm. */
  def norm2(a: Column): Column =
    col(Norm2(GraftColumnBridge.expression(a)))

  /** HOF twin of [[dot]] — same fold, interpreted higher-order path.
    * Kept as the independent parity witness for VectorExpressionsSpec.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** cosine similarity from precomputed squared norms.
    *
    * PRECONDITION: callers must exclude zero-norm vectors first
    * (`filter(n2 > 0)`, twin `WHERE n2 > 0`) — cosine is undefined
    * for a vector with no direction, and the raw division is a
    * DIVIDE_BY_ZERO runtime error under ANSI. Every cosine site
    * filters at its `v` seam (the production-ANN convention: index
    * builds drop zero vectors); the formula itself stays guard-free
    * so the hot path keeps its single codegen'd expression.
    */
  def cosineFrom(dotAb: Column, n2a: Column, n2b: Column): Column =
    dotAb / (sqrt(n2a) * sqrt(n2b))

  /** DuckDB twins (identical fold order). */
  val dotSql: (String, String) => String = (a, b) =>
    s"""list_reduce(list_transform(range(1, len($a) + 1),
       |  i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)),
       |  (acc, x) -> acc + x)""".stripMargin

  val norm2Sql: String => String = a =>
    s"""list_reduce(list_transform($a,
       |  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
       |  (acc, x) -> acc + x)""".stripMargin
}
