package graft.analytics

import org.apache.spark.ml.classification.RandomForestClassifier
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.PrefixSum
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

  /** Verdict rows for the churn model — the r11-verdict device of
    * emitting assertion results AS DATA, so the driver's rows-only gate
    * on the statistical entry carries real correctness signal (the
    * dumped parquet is self-describing: every `ok` must read true).
    * The bands are DATA-INDEPENDENT contracts (the reference's
    * published 87.1%/98.3% operating point is Olist-specific — on the
    * harness's TPC-H-shaped warehouse the same recipe reads ~0.84/0.82,
    * so a published-band verdict would be vacuously false here; the
    * published-point recovery stays pinned on the Olist-shaped fixture
    * in MlPublishedMetricsSpec):
    *
    *  - precision beats the test-set churn BASE RATE (lift > 1 — an
    *    uninformative classifier's expected precision IS the base rate)
    *  - recall beats the PREDICTED-POSITIVE rate (an uninformative
    *    classifier flagging at rate r has expected recall r)
    *  - evaluator AUC > 0.6 AND matches the RELATIONAL pairwise AUC
    *    computed over the same predictions by the hash-gated
    *    [[PrefixSum]] path, within `aucTol` — 1e-9 while the curve is
    *    exact (distinct scores ≤ the evaluator's 1000-bin curve
    *    downsampling threshold, summation-order noise only), 0.005
    *    beyond it (the binned-curve allowance)
    *  - feature importances non-negative, summing to 1 ± 1e-6
    *
    * Factored out so MlVerdictSpec can feed perturbed metrics and pin
    * that each verdict FLIPS (a gate that can't fail is not a gate).
    *
    * Degenerate one-class inputs (like the missing-AUC None case): on
    * an all-positive test set baseRate = 1.0, so `precision >
    * baseRate` is unsatisfiable even for a perfect classifier — the
    * precision verdict reads VACUOUSLY FALSE, by design. Lift over
    * base rate is undefined when there is no negative class to lift
    * over, and the safe failure direction is red: a degenerate-sweep
    * reader should interpret a false verdict on a one-class fixture as
    * "no signal possible here", not as a model regression (MlVerdictSpec
    * pins the one-class case).
    */
  private[graft] def churnVerdicts(
      tp: Long, fp: Long, fn: Long, tn: Long,
      auc: Double, aucRelational: Option[Double],
      importances: Seq[(String, Double)],
      aucTol: Double = 0.005): Seq[(String, Double, Boolean)] = {
    val nTest = (tp + fp + fn + tn).toDouble
    val baseRate = if (nTest == 0) 1.0 else (tp + fn) / nTest
    val predPos  = if (nTest == 0) 1.0 else (tp + fp) / nTest
    val precision = if (tp + fp == 0) 0.0 else tp.toDouble / (tp + fp)
    val recall    = if (tp + fn == 0) 0.0 else tp.toDouble / (tp + fn)
    val impSum = importances.map(_._2).sum
    val impOk  = math.abs(impSum - 1.0) < 1e-6 &&
      importances.forall(_._2 >= 0.0)
    val aucOk = auc > 0.6 &&
      aucRelational.exists(a => math.abs(a - auc) <= aucTol)
    Seq(
      ("precision_churn", precision, tp + fp > 0 && precision > baseRate),
      ("recall_churn", recall, recall > predPos),
      ("auc_roc", auc, aucOk),
      ("auc_roc_relational", aucRelational.getOrElse(Double.NaN), aucOk),
      ("feature_importance_sum", impSum, impOk)) ++
      importances.map { case (f, v) => (s"importance_$f", v, impOk) }
  }

  /** Exact pairwise AUC = P(score⁺ > score⁻) + ½·P(tie), computed
    * RELATIONALLY on score grain (one hash agg collapses the
    * predictions, then one [[PrefixSum]] two-pass — the q9l skeleton,
    * never a single-task window): for each score s,
    * neg_s · (posAbove_s + pos_s/2), normalized by np·nn. This is
    * bit-identical to the trapezoid over the full ROC curve, so it
    * independently cross-checks the evaluator's statistical path with
    * an operator whose math is already DuckDB-hash-gated (q9l). None
    * when either class is absent (AUC undefined); otherwise
    * (auc, distinctScores) — the score-grain cardinality decides
    * whether the evaluator's curve was downsampled (> 1000 bins) and
    * therefore how tight the cross-check tolerance may be.
    */
  private[graft] def pairwiseAuc(scored: DataFrame): Option[(Double, Long)] = {
    import scored.sparkSession.implicits._
    val grain = scored.groupBy($"score")
      .agg(sum(when($"label" === 1.0, 1L).otherwise(0L)).as("pos"),
        sum(when($"label" === 1.0, 0L).otherwise(1L)).as("neg"))
    val r = PrefixSum.exclusivePrefixSum(grain,
        Seq(col("score").desc), col("pos"), "cpos")
      .agg(sum($"neg".cast("double") * ($"cpos" + $"pos" / 2.0)).as("num"),
        sum($"pos").as("np"), sum($"neg").as("nn"),
        count(lit(1)).as("nd"))
      .head()
    if (r.isNullAt(1) || r.getLong(1) == 0L || r.getLong(2) == 0L) None
    else Some((r.getDouble(0) / (r.getLong(1).toDouble * r.getLong(2).toDouble),
      r.getLong(3)))
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
        // pred feeds 6 actions (4 counts + evaluator AUC + relational
        // AUC); cache for their duration only — unpersisted below so no
        // CacheManager entry outlives the query (CacheSpec invariant).
        val pred  = model.transform(assembler.transform(test)).cache()
        val (tp, fp, fn, tn, auc, aucRel) = try {
          val tp = pred.filter($"label" === 1.0 && $"prediction" === 1.0).count()
          val fp = pred.filter($"label" === 0.0 && $"prediction" === 1.0).count()
          val fn = pred.filter($"label" === 1.0 && $"prediction" === 0.0).count()
          val tn = pred.filter($"label" === 0.0 && $"prediction" === 0.0).count()
          val auc = new BinaryClassificationEvaluator()
            .setLabelCol("label").setMetricName("areaUnderROC").evaluate(pred)
          val aucRel = pairwiseAuc(pred.select(
            org.apache.spark.ml.functions.vector_to_array($"probability")(1)
              .as("score"), $"label"))
          (tp, fp, fn, tn, auc, aucRel)
        } finally pred.unpersist()
        val importances = FeatureCols.zip(model.featureImportances.toArray)
        // exact curve (no evaluator downsampling) → demand equality to
        // summation-order noise; binned curve → the 0.005 allowance
        val aucTol = if (aucRel.exists(_._2 <= 1000L)) 1e-9 else 0.005
        churnVerdicts(tp, fp, fn, tn, auc, aucRel.map(_._1), importances,
          aucTol).toDF("metric", "value", "ok")
      } finally data.unpersist()
  }

  /** Verdict rows for the elasticity LR: each spark.ml scalar must
    * match q9hElasticity's CLOSED-FORM solution on the same price
    * bands — and q9h is itself DuckDB-hash-gated, so these booleans
    * chain the statistical entry to an oracle-checked ground truth
    * (the MlSpec cross-check, emitted as data for the driver's gate).
    * Tolerances are MlSpec's: the LR path folds raw doubles where the
    * closed form snaps per-band logs to DECIMAL(38,9). NaN closed-form
    * inputs (degenerate <2-band feeds) read as not-ok, never a crash.
    * Factored out so MlVerdictSpec can pin that perturbed fits flip.
    */
  private[graft] def elasticityVerdicts(
      slope: Double, intercept: Double, r2: Double,
      cfSlope: Double, cfIntercept: Double, cfR2: Double)
      : Seq[(String, Double, Boolean)] = Seq(
    ("elasticity_slope", slope, math.abs(slope - cfSlope) < 1e-4),
    ("intercept", intercept, math.abs(intercept - cfIntercept) < 1e-3),
    ("r2", r2, math.abs(r2 - cfR2) < 1e-4))

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
      // the oracle-gated closed form on the same bands (1 row — a
      // bounded driver action, same grain as the model scalars)
      val cf = AnalyticsQueries.q9hElasticity.fn(spark, dir).head()
      def d(name: String): Double = {
        val i = cf.fieldIndex(name)
        if (cf.isNullAt(i)) Double.NaN else cf.getDouble(i)
      }
      elasticityVerdicts(
        model.coefficients(0), model.intercept, model.summary.r2,
        d("elasticity_slope"), d("intercept"), d("r2"))
        .toDF("metric", "value", "ok")
  }

  /** ROC curve points (ref `roc_curve` `PythonAnalysis.py:301-302`,
    * M6) as a pure RELATIONAL operator over a `(score: double,
    * label: double ∈ {0,1})` frame: one (fpr, tpr) row per distinct
    * score threshold, descending. Splitting this from the model fit
    * makes the curve math oracle-gatable (the fit is statistical; the
    * curve is not) — the registered q9l gates it on planted
    * deterministic scores, and MlSpec feeds it real predictions.
    *
    * Scale shape: the input first collapses to SCORE grain (one hash
    * agg — at 100 TB the raw predictions never reach a window), then
    * the two cumulative counts ride [[PrefixSum]]'s distributed
    * two-pass skeleton instead of the single-task empty-partition
    * window the naive form uses. The grand totals are one broadcast
    * row. With no positive (or no negative) label the affected rate
    * is UNDEFINED: that column is NULL on both engines — an explicit
    * guard, because ANSI Spark turns the bare division into a
    * DIVIDE_BY_ZERO runtime error on a one-class input (flushed by
    * DegenerateInputSpec's constant warehouse).
    */
  def rocPoints(scored: DataFrame): DataFrame = {
    import scored.sparkSession.implicits._
    val grain = scored.groupBy($"score")
      .agg(sum(when($"label" === 1.0, 1L).otherwise(0L)).as("pos"),
        sum(when($"label" === 1.0, 0L).otherwise(1L)).as("neg"))
    val totals = grain.agg(sum($"pos").as("np"), sum($"neg").as("nn"))
    val cum = PrefixSum.exclusivePrefixSum(
      PrefixSum.exclusivePrefixSum(grain,
        Seq(col("score").desc), col("pos"), "ctp"),
      Seq(col("score").desc), col("neg"), "cfp")
    def rate(num: Column, den: Column): Column =
      when(den =!= 0L, num.cast("double") / den)
    cum.crossJoin(broadcast(totals))
      .select($"score".as("threshold"),
        rate($"cfp" + $"neg", $"nn").as("fpr"),
        rate($"ctp" + $"pos", $"np").as("tpr"))
      .orderBy($"threshold".desc)
  }

  /** q9l — [[rocPoints]] hash-gated on PLANTED deterministic scores:
    * label = (custkey mod 3 = 0), score = (m mod 1000) + label·250
    * with m the md5 52-bit integer (the q12q device) — overlapping
    * score distributions (an informative but imperfect scorer), and
    * the whole pipeline is INTEGER math until the final fpr/tpr
    * divisions (int/int, exact-rounded identically). A first cut
    * blended doubles (u·¾ + label·¼) and DuckDB's decimal-literal
    * arithmetic diverged from Spark's by one ulp on 1 of ~300
    * thresholds — the integer-ranking rule applies to GROUP KEYS as
    * much as to sort keys. The oracle recomputes the cumulative
    * counts with DuckDB's window SUM — independently validating that
    * PrefixSum's two-pass form ≡ the textbook cumulative window. The
    * MODEL-fed curve (statistical input) lives in MlSpec, not the
    * registry.
    */
  val q9lRocPoints: GraftQuery = GraftQuery(
    "q9l_roc_points",
    """WITH s AS (
      |  SELECT CAST(('0x' || SUBSTR(md5(CAST(c_custkey AS VARCHAR) || '|roc'),
      |               1, 13)) AS BIGINT) % 1000
      |           + CASE WHEN c_custkey % 3 = 0 THEN 250 ELSE 0 END AS score,
      |         CASE WHEN c_custkey % 3 = 0 THEN 1 ELSE 0 END AS lbl
      |  FROM customer),
      |g AS (SELECT score,
      |             CAST(SUM(lbl) AS BIGINT) AS pos,
      |             CAST(SUM(1 - lbl) AS BIGINT) AS neg
      |      FROM s GROUP BY 1),
      |c AS (SELECT score, pos, neg,
      |             CAST(SUM(pos) OVER (ORDER BY score DESC) AS BIGINT) AS tp,
      |             CAST(SUM(neg) OVER (ORDER BY score DESC) AS BIGINT) AS fp
      |      FROM g),
      |t AS (SELECT CAST(SUM(pos) AS BIGINT) AS np,
      |             CAST(SUM(neg) AS BIGINT) AS nn FROM g)
      |SELECT CAST(score AS BIGINT) AS threshold,
      |       CASE WHEN nn <> 0 THEN CAST(fp AS DOUBLE) / nn END AS fpr,
      |       CASE WHEN np <> 0 THEN CAST(tp AS DOUBLE) / np END AS tpr
      |FROM c, t ORDER BY threshold DESC""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val m52 = conv(substring(md5(concat($"c_custkey".cast("string"),
      lit("|roc"))), 1, 13), 16, 10).cast("long")
    val isPos = $"c_custkey" % 3 === 0
    rocPoints(graft.Tables(spark, dir).customer
      .select((m52 % 1000 + when(isPos, 250L).otherwise(0L)).as("score"),
        when(isPos, 1.0).otherwise(0.0).as("label")))
  }

  /** q9t — decile gains/lift table on [[q9lRocPoints]]'s planted
    * scorer: the campaign-targeting readout next to the ROC curve
    * ("mail the top decile, capture X% of responders at Y× lift").
    * Deciles come from the exact global NTILE on the
    * [[graft.operators.DistributedRank]] scale path (score DESC,
    * custkey tie-break — the q28 device), so the assignment matches
    * DuckDB's NTILE window bit-for-bit; every metric is integer
    * basis-points with integer division, and the one product that
    * could clear BIGINT at 10⁹ customers (responders·total_n·10⁴)
    * runs in 128-bit (DECIMAL(38,0) / HUGEINT — the q12y device; the
    * frame is 10 rows, so the cost is nil). Cumulative capture rides
    * a DECILE-grain window (10 rows — bounded by the ntile count,
    * never the data).
    */
  val q9tGainsTable: GraftQuery = GraftQuery(
    "q9t_gains_table",
    """WITH s AS (
      |  SELECT c_custkey,
      |         CAST(('0x' || SUBSTR(md5(CAST(c_custkey AS VARCHAR) || '|roc'),
      |              1, 13)) AS BIGINT) % 1000
      |           + CASE WHEN c_custkey % 3 = 0 THEN 250 ELSE 0 END AS score,
      |         CASE WHEN c_custkey % 3 = 0 THEN 1 ELSE 0 END AS lbl
      |  FROM customer),
      |dec AS (
      |  SELECT *, NTILE(10) OVER (ORDER BY score DESC, c_custkey ASC)
      |    AS decile FROM s),
      |agg AS (
      |  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
      |         CAST(SUM(lbl) AS BIGINT) AS responders
      |  FROM dec GROUP BY 1),
      |tot AS (
      |  SELECT CAST(SUM(n) AS BIGINT) AS tn,
      |         CAST(SUM(responders) AS BIGINT) AS tp
      |  FROM agg),
      |cum AS (
      |  SELECT decile, n, responders,
      |         CAST(SUM(responders) OVER (ORDER BY decile) AS BIGINT)
      |           AS cum_resp
      |  FROM agg)
      |SELECT CAST(decile AS INTEGER) AS decile, n, responders,
      |       (responders * 10000) // n AS resp_bps,
      |       (cum_resp * 10000) // tp AS cum_capture_bps,
      |       CAST((CAST(responders AS HUGEINT) * tn * 10000)
      |            // (CAST(n AS HUGEINT) * tp) AS BIGINT) AS lift_bps
      |FROM cum, tot""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val m52 = conv(substring(md5(concat($"c_custkey".cast("string"),
      lit("|roc"))), 1, 13), 16, 10).cast("long")
    val isPos = $"c_custkey" % 3 === 0
    val s = graft.Tables(spark, dir).customer
      .select($"c_custkey",
        (m52 % 1000 + when(isPos, 250L).otherwise(0L)).as("score"),
        when(isPos, 1L).otherwise(0L).as("lbl"))
    val dec = graft.operators.DistributedRank.rankNtile(s, Seq.empty,
      Seq($"score".desc, $"c_custkey".asc), 10, "__r", "decile")
    val agg = dec.groupBy($"decile")
      .agg(count(lit(1)).as("n"), sum($"lbl").as("responders"))
    val tot = agg.agg(sum($"n").as("tn"), sum($"responders").as("tp"))
    val w = Window.orderBy($"decile") // decile grain: exactly 10 rows
    agg
      .withColumn("cum_resp", sum($"responders").over(w))
      .crossJoin(broadcast(tot))
      .select($"decile", $"n", $"responders",
        expr("(responders * 10000) div n").as("resp_bps"),
        expr("(cum_resp * 10000) div tp").as("cum_capture_bps"),
        expr("""(cast(responders as decimal(38,0)) * tn * 10000)
               | div (cast(n as decimal(38,0)) * tp)""".stripMargin)
          .as("lift_bps"))
  }

  val all: Seq[GraftQuery] =
    Seq(q9jChurnModel, q9kElasticityLr, q9lRocPoints, q9tGainsTable)
}
