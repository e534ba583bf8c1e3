package graft

import org.apache.spark.sql.functions._

import graft.analytics.MlQueries

/** Pin the reference's PUBLISHED model metrics (BASELINE.md rows
  * 21-24: churn precision 87.1% / recall 98.3%, price elasticity
  * ≈ −2.8) on Olist-shaped fixtures with KNOWN ground truth — r9
  * verdict task 6. The reference's numbers come from its private
  * Olist run, so they can't be replayed bit-exact; what CAN be
  * verified is that the engine's estimator recipes (balanced RF 200
  * trees, stratified 70/30 seed 42; log-log LinearRegression over
  * price bins) RECOVER a designed ground truth placed at the
  * published values:
  *
  *  - churn: a 3-cell customer population (clear-churn / ambiguous /
  *    clear-retained) whose cell sizes put the Bayes-optimal
  *    confusion exactly at the published operating point — ~1.7% of
  *    churners are feature-indistinguishable from loyal customers
  *    (missed → recall 98.3%) and the ambiguous cell carries the
  *    retained mass that produces precision 87.1%;
  *  - elasticity: per-band demand set exactly to C·price^−2.8, so the
  *    published coefficient IS the curve's true slope.
  *
  * A regression in weighting, splitting, label derivation (90-day
  * rule), or the band/log pipeline moves the recovered metrics out of
  * the bands.
  */
class MlPublishedMetricsSpec extends SparkTestBase {
  import spark.implicits._

  private val DMax = java.time.LocalDate.parse("2018-08-31")
  private def d(daysBack: Int): String = DMax.minusDays(daysBack).toString

  /** (custkey, orderDatesBack, price, discount, tax) — one lineitem
    * per order; features are then n_orders = dates.size,
    * total_spend = n·price·(1−disc), avg_freight = price·tax,
    * tenure = max−min, churned = last-order age > 90 d.
    */
  private def cell(key0: Long, n: Int, datesBack: Seq[Int], price: Double,
      disc: Double, tax: Double): Seq[(Long, Seq[Int], Double, Double, Double)] =
    (0 until n).map(i => (key0 + i, datesBack, price, disc, tax))

  private def buildChurnFixture(): String = {
    val tmp = java.nio.file.Files.createTempDirectory("olist-churn").toString
    // population 3001: 1800 churn / 1201 retained (Olist-like churn
    // majority). Cells B and C each mix labels on IDENTICAL feature
    // vectors — only the order dates (hence the 90-day label) differ.
    val customers =
      // A: clear churn — one old order
      cell(10000, 1169, Seq(180), 60.0, 0.10, 0.05) ++
      // B churn + B retained: two orders, tenure 60 — ambiguous cell,
      // weighted majority churn => its retained members become the FPs
      cell(20000, 600, Seq(180, 120), 70.0, 0.05, 0.08) ++
      cell(25000, 262, Seq(90, 30), 70.0, 0.05, 0.08) ++
      // C retained + C churn: eight orders, tenure 350 — loyal-shaped
      // cell, majority retained => its churn members become the FNs
      cell(30000, 938, (0 to 7).map(j => 360 - 50 * j), 120.0, 0.0, 0.06) ++
      cell(35000, 31, (0 to 7).map(j => 450 - 50 * j), 120.0, 0.0, 0.06) ++
      // anchor: one loyal customer whose last order IS the corpus max
      // date, so every days-since-last is measured against DMax
      cell(40000, 1, (0 to 7).map(j => 350 - 50 * j), 120.0, 0.0, 0.06)

    customers.map(c => Tuple1(c._1)).toDF("c_custkey")
      .write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    val orders = customers.flatMap { case (ck, dates, _, _, _) =>
      dates.zipWithIndex.map { case (db, j) => (ck * 100 + j, ck, d(db)) } }
    orders.toDF("o_orderkey", "o_custkey", "date_s")
      .select($"o_orderkey", $"o_custkey",
        to_timestamp($"date_s").as("o_orderdate"))
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    customers.flatMap { case (ck, dates, p, disc, tax) =>
      dates.indices.map(j => (ck * 100 + j, p, disc, tax)) }
      .toDF("l_orderkey", "l_extendedprice", "l_discount", "l_tax")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    tmp
  }

  test("churn RF recovers the published 87.1% precision / 98.3% recall " +
    "operating point on the Olist-shaped fixture") {
    val dir = buildChurnFixture()
    val rows = MlQueries.q9jChurnModel.fn(spark, dir).collect()
    // the r12 verdict columns are data-independent contracts — they
    // must hold on the Olist-shaped fixture too, not just the TPC-H
    // warehouse MlVerdictSpec pins
    rows.foreach(r => assert(r.getBoolean(2),
      s"${r.getString(0)} verdict false on the Olist fixture"))
    val m = rows.map(r => r.getString(0) -> r.getDouble(1)).toMap
    // designed ground truth: precision 0.871, recall 0.983; the 70/30
    // stratified sample moves the realized test-set ratios by a few
    // binomial sigma, so the pins are bands around the published
    // numbers (±0.05 / [0.955, 1])
    assert(m("precision_churn") > 0.82 && m("precision_churn") < 0.92,
      s"precision ${m("precision_churn")} left the published 87.1% band")
    assert(m("recall_churn") > 0.955 && m("recall_churn") <= 1.0,
      s"recall ${m("recall_churn")} left the published 98.3% band")
    // the designed FNs exist, so recall must NOT be a degenerate 1.0
    // with precision at the base rate
    assert(m("precision_churn") > 0.8 && m("recall_churn") < 1.0,
      "model degenerated to predict-all-churn")
    // three feature cells give three score levels — heavy ties cap the
    // design's own AUC near 0.89; the pin just excludes a broken ranker
    assert(m("auc_roc") > 0.85, s"auc ${m("auc_roc")}")
  }

  test("elasticity LR recovers the published -2.8 log-log slope exactly " +
    "on a fixture whose true elasticity is -2.8") {
    val tmp = java.nio.file.Files.createTempDirectory("olist-elast").toString
    val beta = -2.8
    val logC = 25.0
    // one row per 5000-wide price band: avg_price = the row's price,
    // demand = exp(logC + beta*ln p) EXACTLY (l_quantity is a double)
    // => the fitted slope has no binning or rounding error to absorb
    (1 to 20).map { b =>
      val p = 5000.0 * b + 2500.0
      (b.toLong, p, math.exp(logC + beta * math.log(p)), 0.0, 0.0)
    }.toDF("l_orderkey", "l_extendedprice", "l_quantity", "l_discount", "l_tax")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val m = MlQueries.q9kElasticityLr.fn(spark, tmp)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(m("elasticity_slope") - beta) < 1e-6,
      s"slope ${m("elasticity_slope")} != published $beta")
    assert(m("r2") > 1.0 - 1e-9, s"power-law fit must be exact, r2=${m("r2")}")
  }
}
