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

  test("rocPoints on real model scores: well-formed monotone curve") {
    import spark.implicits._
    import org.apache.spark.ml.classification.RandomForestClassifier
    import org.apache.spark.ml.feature.VectorAssembler
    import org.apache.spark.ml.functions.vector_to_array
    // the MODEL-fed curve: statistical input, so range/shape asserts
    // here — the curve MATH is hash-gated separately by q9l's planted
    // deterministic scores
    val data = MlQueries.churnDataset(spark, sfDir)
    val assembler = new VectorAssembler()
      .setInputCols(MlQueries.FeatureCols.toArray).setOutputCol("features")
    val model = new RandomForestClassifier()
      .setNumTrees(20).setSeed(42L)
      .setLabelCol("label").setFeaturesCol("features")
      .fit(assembler.transform(data))
    val scored = model.transform(assembler.transform(data))
      .select(vector_to_array($"probability")(1).as("score"), $"label")
    val pts = MlQueries.rocPoints(scored)
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    assert(pts.nonEmpty)
    // thresholds strictly descending; fpr/tpr monotone non-decreasing
    // along the curve, all within [0, 1], terminating at (1, 1)
    pts.sliding(2).foreach {
      case Array((t1, f1, p1), (t2, f2, p2)) =>
        assert(t1 > t2, s"thresholds not descending: $t1 then $t2")
        assert(f2 >= f1 && p2 >= p1, "curve must be monotone")
      case _ =>
    }
    pts.foreach { case (_, f, p) =>
      assert(f >= 0 && f <= 1 && p >= 0 && p <= 1) }
    val (_, fLast, pLast) = pts.last
    assert(fLast === 1.0 && pLast === 1.0,
      "lowest threshold must classify everything positive")
    // trapezoidal AUC over the curve beats chance on training data
    val auc = (Seq((0.0, 0.0)) ++ pts.map(p => (p._2, p._3)))
      .sliding(2).collect { case Seq((f1, p1), (f2, p2)) =>
        (f2 - f1) * (p1 + p2) / 2 }.sum
    assert(auc > 0.5, s"trapezoid AUC $auc not better than chance")
  }

  test("two-feature OLS matches spark.ml LinearRegression coefficients") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.ml.feature.VectorAssembler
    import org.apache.spark.ml.regression.LinearRegression
    val cf = graft.analytics.AnalyticsQueries.q9pMultiReg
      .fn(spark, sfDir).head()
    val li = Tables(spark, sfDir).lineitem
    val pts = li
      .groupBy(floor($"l_extendedprice" / 5000).as("band"))
      .agg(avg($"l_extendedprice").as("avg_price"),
        avg($"l_discount").as("avg_disc"),
        sum($"l_quantity").as("demand"))
      .filter($"avg_price" > 0 && $"demand" > 0)
      .select(log($"avg_price").as("x1"), $"avg_disc".as("x2"),
        log($"demand").as("label"))
    val assembled = new VectorAssembler().setInputCols(Array("x1", "x2"))
      .setOutputCol("features").transform(pts)
    val model = new LinearRegression().setFeaturesCol("features")
      .setLabelCol("label").fit(assembled)
    assert(math.abs(model.coefficients(0) - cf.getAs[Double]("beta_price")) < 1e-4,
      s"beta_price ml=${model.coefficients(0)} cf=${cf.getAs[Double]("beta_price")}")
    assert(math.abs(model.coefficients(1) - cf.getAs[Double]("beta_discount")) < 1e-3,
      s"beta_discount ml=${model.coefficients(1)} cf=${cf.getAs[Double]("beta_discount")}")
    assert(math.abs(model.intercept - cf.getAs[Double]("intercept")) < 1e-3)
    assert(math.abs(model.summary.r2 - cf.getAs[Double]("r2")) < 1e-4)
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
