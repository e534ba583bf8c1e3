package graft

import org.apache.spark.sql.functions._

import graft.analytics.{AnalyticsQueries, MlQueries}

/** The ML trio (q9j / q9k / q9d_approx) are the registry's only
  * rows-only entries (no DuckDB oracle can refit an RF), so their
  * outputs carry VERDICT COLUMNS — assertion results emitted as data
  * (r11 verdict task 1, the q26a/q9a_approx device). A gate that can't
  * fail is not a gate: this spec pins BOTH directions — every verdict
  * reads true on the real warehouse, and a perturbed model/cut flips
  * exactly the verdict that should notice it.
  */
class MlVerdictSpec extends SparkTestBase {

  test("q9j: every verdict true on the warehouse; leak feature absent") {
    val rows = MlQueries.q9jChurnModel.fn(spark, sfDir).collect()
    assert(rows.length >= 7)
    rows.foreach { r =>
      assert(r.getBoolean(2),
        s"${r.getString(0)}=${r.getDouble(1)} verdict false")
    }
    assert(!rows.exists(_.getString(0) == "importance_days_since_last"))
  }

  test("q9j churnVerdicts: each perturbation flips its own verdict") {
    def v(tp: Long, fp: Long, fn: Long, tn: Long, auc: Double,
          rel: Option[Double], imp: Seq[(String, Double)]) =
      MlQueries.churnVerdicts(tp, fp, fn, tn, auc, rel, imp)
        .map(t => t._1 -> t._3).toMap
    val goodImp = Seq("a" -> 0.5, "b" -> 0.5)
    val base = v(80, 20, 20, 80, 0.9, Some(0.9), goodImp)
    assert(base.values.forall(identity), s"baseline not all-true: $base")
    // uninformative classifier: precision = base rate, recall =
    // predicted-positive rate → both lift verdicts flip
    val chance = v(50, 50, 50, 50, 0.5, Some(0.5), goodImp)
    assert(!chance("precision_churn") && !chance("recall_churn"))
    // degenerate predict-nothing model
    assert(!v(0, 0, 100, 100, 0.9, Some(0.9), goodImp)("precision_churn"))
    // evaluator AUC diverging from the relational pairwise path
    assert(!v(80, 20, 20, 80, 0.9, Some(0.8), goodImp)("auc_roc"))
    // ranker at chance
    assert(!v(80, 20, 20, 80, 0.55, Some(0.55), goodImp)("auc_roc"))
    // one-class predictions: pairwise AUC undefined
    assert(!v(80, 20, 20, 80, 0.9, None, goodImp)("auc_roc"))
    // exact-curve tolerance: a 1e-6 cross-path divergence passes the
    // binned allowance but must flip under the exact-curve 1e-9
    assert(MlQueries.churnVerdicts(80, 20, 20, 80, 0.9, Some(0.9 + 1e-6),
      goodImp).find(_._1 == "auc_roc").get._3)
    assert(!MlQueries.churnVerdicts(80, 20, 20, 80, 0.9, Some(0.9 + 1e-6),
      goodImp, aucTol = 1e-9).find(_._1 == "auc_roc").get._3)
    // importances not a distribution (sum ≠ 1 / negative weight)
    assert(!v(80, 20, 20, 80, 0.9, Some(0.9),
      Seq("a" -> 0.7, "b" -> 0.7))("importance_a"))
    assert(!v(80, 20, 20, 80, 0.9, Some(0.9),
      Seq("a" -> 1.2, "b" -> -0.2))("importance_b"))
  }

  test("q9j pairwiseAuc: exact on a hand-checkable tie case") {
    import spark.implicits._
    // pos scores {3, 2}, neg scores {2, 1}: pairs (3,2)+ (3,1)+ (2,1)+
    // (2,2)=tie → AUC = (3 + 0.5) / 4 = 0.875
    val scored = Seq((3.0, 1.0), (2.0, 1.0), (2.0, 0.0), (1.0, 0.0))
      .toDF("score", "label")
    assert(MlQueries.pairwiseAuc(scored).contains((0.875, 3L)))
    // one-class input: undefined, never a division crash
    assert(MlQueries.pairwiseAuc(
      Seq((1.0, 1.0), (2.0, 1.0)).toDF("score", "label")).isEmpty)
  }

  test("q9k: verdicts true on the warehouse; perturbed fits flip") {
    val rows = MlQueries.q9kElasticityLr.fn(spark, sfDir).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getBoolean(2),
        s"${r.getString(0)}=${r.getDouble(1)} diverged from the closed form")
    }
    def ok(s: Seq[(String, Double, Boolean)]) = s.map(t => t._1 -> t._3).toMap
    val good = ok(MlQueries.elasticityVerdicts(-2.8, 25.0, 0.99,
      -2.8, 25.0, 0.99))
    assert(good.values.forall(identity))
    val drift = ok(MlQueries.elasticityVerdicts(-2.8 + 1e-2, 25.0, 0.99,
      -2.8, 25.0, 0.99))
    assert(!drift("elasticity_slope") && drift("intercept") && drift("r2"))
    // NaN closed form (degenerate <2-band feed): not-ok, not a crash
    val nan = ok(MlQueries.elasticityVerdicts(-2.8, 25.0, 0.99,
      Double.NaN, Double.NaN, Double.NaN))
    assert(nan.values.forall(v => !v))
  }

  test("q9d_approx: rank verdict true on the warehouse AND at sfDir via registry") {
    val rows = AnalyticsQueries.q9dApproxSegmentation.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(5),
      "cuts_in_rank_band false on real percentile_approx cuts"))
  }

  test("q9d_approx: deliberately wrong cuts flip cuts_in_rank_band") {
    import spark.implicits._
    val cust = (1 to 300)
      .map(i => (i.toLong, i.toDouble, i.toLong))
      .toDF("o_custkey", "spend", "n_orders")
    // true tertile cuts for 1..300 at q=2/3 and 1/3
    val goodCuts = Seq((200.0, 100.0, 200L, 100L))
      .toDF("spend_hi", "spend_lo", "ord_hi", "ord_lo")
    val good = AnalyticsQueries.approxSegmentationFrom(cust, goodCuts).collect()
    assert(good.nonEmpty && good.forall(_.getBoolean(5)))
    // the MEDIAN passed off as the 2/3 cut: at-most rank 150 < 199 → flip
    val badCuts = Seq((150.0, 100.0, 200L, 100L))
      .toDF("spend_hi", "spend_lo", "ord_hi", "ord_lo")
    val bad = AnalyticsQueries.approxSegmentationFrom(cust, badCuts).collect()
    assert(bad.nonEmpty && bad.forall(r => !r.getBoolean(5)),
      "a median-as-tertile cut slipped through the rank band")
  }
}
