package graft.analytics

import org.apache.spark.ml.classification.RandomForestClassifier
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.GraftQuery

/** spark.ml equivalents of the reference's sklearn estimators
  * (ref `PythonAnalysis.py:281-302, 346-354`, SURVEY §2.9 M1–M6):
  * stratified 70/30 split seed 42, balanced RandomForest (200 trees)
  * churn classifier with precision/recall/AUC + feature importances,
  * and a LinearRegression elasticity fit over the price-band log-log
  * points. Statistical, not hash-stable → no DuckDB oracle (rows-only
  * check); metric-range assertions live in MlSpec.
  *
  * Scale: feature building is the distributed q9e plan; only the tiny
  * model-summary scalars reach the driver. RF fit itself is
  * executor-distributed via spark.ml.
  */
object MlQueries {

  /** days_since_last is excluded: the 90-day label is a deterministic
    * function of it (AUC would be a meaningless 1.0); the reference's
    * feature set is likewise behavioral-only (`PythonAnalysis.py:256-270`).
    */
  val FeatureCols: Seq[String] =
    Seq("n_orders", "total_spend", "avg_freight", "tenure_days")

  def churnDataset(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    AnalyticsQueries.q9eChurnFeatures.fn(spark, dir)
      .withColumn("label", $"churned".cast("double"))
  }

  /** Balanced class weights (sklearn `class_weight='balanced'`):
    * w(c) = n / (k·n_c).
    */
  private def withBalancedWeights(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    val counts = df.groupBy($"label").count()
      .withColumn("w", sum("count").over(
        org.apache.spark.sql.expressions.Window.partitionBy())
        / (lit(2.0) * col("count")))
      .select($"label".as("wlabel"), $"w")
    df.join(broadcast(counts), df("label") === counts("wlabel")).drop("wlabel")
  }

  val q9jChurnModel: GraftQuery = GraftQuery.noOracle("q9j_churn_model") {
    (spark, dir) =>
      import spark.implicits._
      val data = withBalancedWeights(churnDataset(spark, dir)).cache()
      try {
        // stratified 70/30, seed 42 (per-class sampleBy + anti-join)
        val fractions = Map(0.0 -> 0.7, 1.0 -> 0.7)
        val train = data.stat.sampleBy("label", fractions, 42L)
        val test  = data.join(train.select($"c_custkey".as("tk")),
          $"c_custkey" === $"tk", "left_anti")
        val assembler = new VectorAssembler()
          .setInputCols(FeatureCols.toArray).setOutputCol("features")
        val rf = new RandomForestClassifier()
          .setNumTrees(200).setSeed(42L).setWeightCol("w")
          .setLabelCol("label").setFeaturesCol("features")
        val model = rf.fit(assembler.transform(train))
        // pred feeds 4 actions (3 counts + AUC); cache for their
        // duration only — unpersisted below so no CacheManager entry
        // outlives the query (CacheSpec invariant).
        val pred  = model.transform(assembler.transform(test)).cache()
        val (tp, fp, fn, auc) = try {
          val tp = pred.filter($"label" === 1.0 && $"prediction" === 1.0).count()
          val fp = pred.filter($"label" === 0.0 && $"prediction" === 1.0).count()
          val fn = pred.filter($"label" === 1.0 && $"prediction" === 0.0).count()
          val auc = new BinaryClassificationEvaluator()
            .setLabelCol("label").setMetricName("areaUnderROC").evaluate(pred)
          (tp, fp, fn, auc)
        } finally pred.unpersist()
        val precision = if (tp + fp == 0) 0.0 else tp.toDouble / (tp + fp)
        val recall    = if (tp + fn == 0) 0.0 else tp.toDouble / (tp + fn)
        val importances = FeatureCols.zip(model.featureImportances.toArray)
        val metrics = Seq(
          ("precision_churn", precision),
          ("recall_churn", recall),
          ("auc_roc", auc)) ++
          importances.map { case (f, v) => (s"importance_$f", v) }
        metrics.toDF("metric", "value")
      } finally data.unpersist()
  }

  val q9kElasticityLr: GraftQuery = GraftQuery.noOracle("q9k_elasticity_lr") {
    (spark, dir) =>
      import spark.implicits._
      val li = graft.Tables(spark, dir).lineitem
      val pts = li
        .groupBy(floor($"l_extendedprice" / 5000).as("band"))
        .agg(avg($"l_extendedprice").as("avg_price"),
          sum($"l_quantity").as("demand"))
        .filter($"avg_price" > 0 && $"demand" > 0)
        .select(log($"avg_price").as("x"), log($"demand").as("label"))
      val assembled = new VectorAssembler().setInputCols(Array("x"))
        .setOutputCol("features").transform(pts)
      val lr = new LinearRegression().setFeaturesCol("features")
        .setLabelCol("label")
      val model = lr.fit(assembled)
      Seq(
        ("elasticity_slope", model.coefficients(0)),
        ("intercept", model.intercept),
        ("r2", model.summary.r2)).toDF("metric", "value")
  }

  /** q9l — ROC curve points (ref `roc_curve` `PythonAnalysis.py:301-302`,
    * M6): (fpr, tpr) per distinct score threshold from the held-out
    * predictions, computed relationally — cumulative positives /
    * negatives over descending score — no RDD detour, no driver math.
    */
  val q9lRocPoints: GraftQuery = GraftQuery.noOracle("q9l_roc_points") {
    (spark, dir) =>
      import spark.implicits._
      import org.apache.spark.ml.functions.vector_to_array
      val data = withBalancedWeights(churnDataset(spark, dir))
      val fractions = Map(0.0 -> 0.7, 1.0 -> 0.7)
      val train = data.stat.sampleBy("label", fractions, 42L)
      val test  = data.join(train.select($"c_custkey".as("tk")),
        $"c_custkey" === $"tk", "left_anti")
      val assembler = new VectorAssembler()
        .setInputCols(FeatureCols.toArray).setOutputCol("features")
      val model = new RandomForestClassifier()
        .setNumTrees(200).setSeed(42L).setWeightCol("w")
        .setLabelCol("label").setFeaturesCol("features")
        .fit(assembler.transform(train))
      val scored = model.transform(assembler.transform(test))
        .select(vector_to_array($"probability")(1).as("score"), $"label")
      val nPos = scored.filter($"label" === 1.0).count().toDouble
      val nNeg = scored.filter($"label" === 0.0).count().toDouble
      val w = org.apache.spark.sql.expressions.Window
        .orderBy($"score".desc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      scored
        .withColumn("cum_tp", sum(when($"label" === 1.0, 1).otherwise(0)).over(w))
        .withColumn("cum_fp", sum(when($"label" === 0.0, 1).otherwise(0)).over(w))
        .groupBy($"score")
        .agg(max($"cum_tp").as("tp"), max($"cum_fp").as("fp"))
        .select($"score".as("threshold"),
          ($"fp" / nNeg).as("fpr"), ($"tp" / nPos).as("tpr"))
        .orderBy($"threshold".desc)
  }

  val all: Seq[GraftQuery] = Seq(q9jChurnModel, q9kElasticityLr, q9lRocPoints)
}
