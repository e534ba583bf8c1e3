package graft

import graft.analytics.MlQueries

/** Metric-range assertions for the spark.ml queries (statistical, not
  * hash-stable — SURVEY §5 iv: assert ranges, not hashes).
  */
class MlSpec extends SparkTestBase {

  test("churn model: metrics well-formed, importances sum to 1") {
    val rows = MlQueries.q9jChurnModel.fn(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    Seq("precision_churn", "recall_churn", "auc_roc").foreach { m =>
      assert(rows(m) >= 0.0 && rows(m) <= 1.0, s"$m=${rows(m)}")
    }
    assert(rows("auc_roc") > 0.5, s"model no better than chance: ${rows("auc_roc")}")
    val impSum = rows.collect { case (k, v) if k.startsWith("importance_") => v }.sum
    assert(math.abs(impSum - 1.0) < 1e-6, s"importances sum $impSum")
    // the leak-prone recency feature must NOT be in the model
    assert(!rows.contains("importance_days_since_last"))
  }

  test("elasticity LR matches the closed-form q9h on the same bins") {
    val lr = MlQueries.q9kElasticityLr.fn(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val cf = graft.analytics.AnalyticsQueries.q9hElasticity.fn(spark, sfDir)
      .collect().head
    val slope = cf.getAs[Double]("elasticity_slope")
    val r2    = cf.getAs[Double]("r2")
    assert(math.abs(lr("elasticity_slope") - slope) < 1e-4,
      s"lr=${lr("elasticity_slope")} closed-form=$slope")
    assert(math.abs(lr("r2") - r2) < 1e-4)
  }
}
