package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.GraftColumnBridge

import graft.functions.{NGramExpressions, NormalizeText, VectorExpressions}
import graft.plans.{GeoRules, Norm2Rewrite}

/** THE session extension for the graft engine — registers everything
  * the library adds to a Spark session in one place:
  *
  *  - SQL functions: `graft_dot`, `graft_norm2` (native codegen
  *    vector expressions, [[graft.functions.VectorExpressions]]),
  *    `graft_ngrams`, and `graft_nfc` / `graft_nfkc` Unicode
  *    normalization ([[graft.functions.NormalizeText]])
  *  - optimizer rules: [[graft.plans.Norm2Rewrite]] (`graft_dot(e,e)`
  *    → `graft_norm2(e)`) and
  *    [[graft.plans.GeoRules.RewriteWithinRadius]] (geo-radius marker
  *    → pushdown-able bbox ∧ exact haversine)
  *
  * Wire-up:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *   // or: --conf spark.sql.extensions=graft.GraftExtensions
  *
  * For sessions graft did not build (the harness driver's), call
  * [[GraftExtensions.install]] — idempotent post-hoc registration via
  * the live FunctionRegistry + `spark.experimental.extraOptimizations`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(VectorExpressions.dotDescriptor)
    ext.injectFunction(VectorExpressions.norm2Descriptor)
    ext.injectFunction(NGramExpressions.ngramsDescriptor)
    ext.injectFunction(NormalizeText.nfcDescriptor)
    ext.injectFunction(NormalizeText.nfkcDescriptor)
    ext.injectOptimizerRule(_ => Norm2Rewrite)
    ext.injectOptimizerRule(_ => GeoRules.RewriteWithinRadius)
  }
}

object GraftExtensions {
  def install(spark: SparkSession): Unit = {
    val reg = GraftColumnBridge.functionRegistry(spark)
    Seq(VectorExpressions.dotDescriptor, VectorExpressions.norm2Descriptor,
        NGramExpressions.ngramsDescriptor,
        NormalizeText.nfcDescriptor, NormalizeText.nfkcDescriptor)
      .foreach { case (ident, info, builder) =>
        if (!reg.functionExists(ident))
          reg.registerFunction(ident, info, builder)
      }
    // extraOptimizations is the public post-hoc seam for optimizer
    // rules on an already-built session; keep the appends idempotent
    Seq(Norm2Rewrite, GeoRules.RewriteWithinRadius).foreach { rule =>
      if (!spark.experimental.extraOptimizations.contains(rule))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ rule
    }
  }
}
