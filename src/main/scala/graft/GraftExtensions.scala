package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.graftshim.SqlShim

import graft.functions.VectorExpressions

/** Session extension registering graft's native expressions as SQL
  * functions, so `spark.sql("... graft_dot(a, b) ...")` works:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *   // or: --conf spark.sql.extensions=graft.GraftExtensions
  *
  * For sessions graft did not build (the harness driver's), call
  * [[GraftExtensions.install]] — idempotent registration on the live
  * session's FunctionRegistry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(VectorExpressions.dotDescriptor)
    ext.injectFunction(VectorExpressions.norm2Descriptor)
    ext.injectOptimizerRule(_ => graft.plans.Norm2Rewrite)
  }
}

object GraftExtensions {
  def install(spark: SparkSession): Unit = {
    val reg = SqlShim.functionRegistry(spark)
    Seq(VectorExpressions.dotDescriptor, VectorExpressions.norm2Descriptor)
      .foreach { case (ident, info, builder) =>
        if (!reg.functionExists(ident))
          reg.registerFunction(ident, info, builder)
      }
    // extraOptimizations is the public post-hoc seam for optimizer
    // rules on an already-built session; keep the append idempotent
    if (!spark.experimental.extraOptimizations.contains(graft.plans.Norm2Rewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.Norm2Rewrite
  }
}
