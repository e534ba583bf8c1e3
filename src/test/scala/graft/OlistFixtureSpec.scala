package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.etl.Warehouse

/** Golden tests on a hand-built Olist-shaped fixture (SURVEY §5 ii):
  * the reference's delivery semantics and 5B on-time rate re-derived
  * from first principles and asserted against hand-computed values —
  * in particular the three-valued on_time_delivery (§1.3) where a
  * missing delivery date must yield NULL, not false, and must be
  * EXCLUDED from the on-time rate.
  */
class OlistFixtureSpec extends SparkTestBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s + " 00:00:00")

  private lazy val fixtureOrders = {
    import spark.implicits._
    Seq(
      // (order_id, purchase, delivered, estimated, status)
      // on time: delivered day 5, estimated day 10 → delay −5 → true
      ("o1", ts("2017-01-01"), ts("2017-01-06"), ts("2017-01-11"), "delivered"),
      // late: delivered day 12, estimated day 10 → delay 2 → false
      ("o2", ts("2017-01-01"), ts("2017-01-13"), ts("2017-01-11"), "delivered"),
      // exactly on the estimate: delay 0 → true (boundary)
      ("o3", ts("2017-02-01"), ts("2017-02-11"), ts("2017-02-11"), "delivered"),
      // missing delivery date → on_time NULL, day counts NULL
      ("o4", ts("2017-02-01"), null, ts("2017-02-11"), "shipped"))
      .toDF("order_id", "purchase_ts", "delivered_ts", "estimated_ts",
        "status")
  }

  test("fact_delivery: day counts and three-valued on_time") {
    import spark.implicits._
    val fd = Warehouse.factDelivery(fixtureOrders).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(fd("o1").getInt(2) == 10 && fd("o1").getInt(3) == 5)
    assert(fd("o1").getInt(4) == -5 && fd("o1").getBoolean(5))
    assert(fd("o2").getInt(4) == 2 && !fd("o2").getBoolean(5))
    assert(fd("o3").getInt(4) == 0 && fd("o3").getBoolean(5),
      "delay == 0 must count as on time")
    assert(fd("o4").isNullAt(3) && fd("o4").isNullAt(5),
      "missing delivery date must be NULL, not false")
  }

  test("5B on-time rate excludes the NULL case (reference semantics)") {
    import spark.implicits._
    val fd = Warehouse.factDelivery(fixtureOrders)
    val rate = fd.agg(
      (avg($"on_time_delivery".cast("double")) * 100).as("rate"))
      .head.getDouble(0)
    // o1 true, o2 false, o3 true, o4 NULL → 2/3, NOT 2/4
    assert(math.abs(rate - 100.0 * 2 / 3) < 1e-9,
      s"rate=$rate — NULL row leaked into the denominator")
  }

  private val RefDir = "/root/reference"

  test("regional revenue-share golden: published shares re-derive (SP 37.38%)") {
    import spark.implicits._
    // `Python Analytics/Results from Python Analytics/
    // descriptive_regional_sales_analysis.csv` — re-derive every
    // published revenue_share_pct and avg_order_value from the file's
    // own revenue/order columns using OUR share formula (window total
    // + round-2, the q9f shape). SP must come out at exactly 37.38.
    val g = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$RefDir/Python Analytics/Results from Python Analytics/" +
        "descriptive_regional_sales_analysis.csv")
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    val derived = g.select($"customer_state",
      $"revenue_share_pct".as("published_share"),
      $"avg_order_value".as("published_aov"),
      round($"total_revenue" / sum($"total_revenue").over(w) * 100, 2)
        .as("derived_share"),
      round($"total_revenue" / $"orders", 2).as("derived_aov"))
    val bad = derived.filter(
      abs($"published_share" - $"derived_share") > 0.005 ||
        abs($"published_aov" - $"derived_aov") > 0.005)
    assert(bad.count() == 0, s"formula drift: ${bad.collect().mkString}")
    val sp = derived.filter($"customer_state" === "SP").head
    assert(sp.getDouble(3) == 37.38,
      s"SP share ${sp.getDouble(3)} != golden 37.38")
  }

  test("2A rollup golden: our rollup reproduces all 1,311 rows") {
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    // `Database/Results from Task 2A Analytical Queries/2A...csv` —
    // strip the reference's subtotal rows, run OUR rollup + label
    // mapping (the q2b shape) over the remaining detail rows, and the
    // full published 1,311-row result must come back value-for-value:
    // 1283 detail + 24 monthly + 3 yearly + 1 grand.
    val labels = Seq("All categories monthly total",
      "All categories yearly total", "Grand total")
    val raw = spark.read.option("header", "true").option("nullValue", "NULL")
      .csv(s"$RefDir/Database/Results from Task 2A Analytical Queries/" +
        "2A. Drill-down and Roll-up Operations multi-level aggregation queries.csv")
      .select($"year".cast("int"), $"month".cast("int"),
        $"category_label", $"revenue".cast(DecimalType(18, 2)))
    val detail = raw.filter(!$"category_label".isin(labels: _*))
    val rolled = detail
      .rollup($"year", $"month", $"category_label")
      .agg(sum($"revenue").cast(DecimalType(18, 2)).as("revenue"),
        when(grouping($"year") === 1, "Grand total")
          .when(grouping($"month") === 1, "All categories yearly total")
          .when(grouping($"category_label") === 1,
            "All categories monthly total")
          .otherwise($"category_label").as("label"))
      .select($"year", $"month", $"label".as("category_label"), $"revenue")
    assert(rolled.count() == 1311L)
    assert(raw.exceptAll(rolled).count() == 0 &&
      rolled.exceptAll(raw).count() == 0,
      "rollup output diverges from the published 2A golden")
  }

  private val ResultsDir =
    s"$RefDir/Database/Results from Task 2A Analytical Queries"

  test("1A YoY golden: lag shape + growth formula re-derive all 24 rows") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    // `1A.Time based Trend Analysis Year over year growth analysis.csv`
    // — re-derive last_year_revenue with OUR q1a lag shape (LAG over
    // PARTITION BY month ORDER BY year; a missing prior year yields
    // NULL via the absent partition row, never a wrong-year match on
    // this data) and yoy_growth_pct with ROUND(100·Δ/prev, 2), from
    // the file's own revenue column. month_name must equal our
    // dim_time derivation (date_format MMMM).
    val g = spark.read.option("header", "true").option("nullValue", "NULL")
      .csv(s"$ResultsDir/1A.Time based Trend Analysis Year over year growth analysis.csv")
      .select($"year".cast("int"), $"month".cast("int"), $"month_name",
        $"revenue".cast(DecimalType(18, 2)),
        $"last_year_revenue".cast(DecimalType(18, 2))
          .as("published_last_year"),
        $"yoy_growth_pct".cast("double").as("published_growth"))
    assert(g.count() == 24)
    val w = Window.partitionBy($"month").orderBy($"year")
    val derived = g
      .withColumn("derived_last_year", lag($"revenue", 1).over(w))
      .withColumn("derived_growth",
        round(lit(100.0) * ($"revenue" - $"derived_last_year") /
          nullif($"derived_last_year", lit(0)), 2))
      .withColumn("derived_month_name",
        date_format(make_date($"year", $"month", lit(1)), "MMMM"))
    val badLag = derived.filter(
      !($"published_last_year" <=> $"derived_last_year")).count()
    assert(badLag == 0, s"$badLag rows where the lag shape diverges")
    val badGrowth = derived.filter(
      ($"published_growth".isNull !== $"derived_growth".isNull) ||
        abs($"published_growth" - $"derived_growth") > 0.005).count()
    assert(badGrowth == 0, s"$badGrowth rows where growth pct diverges")
    val badName = derived
      .filter($"month_name" =!= $"derived_month_name").count()
    assert(badName == 0, s"$badName rows where month_name diverges")
  }

  test("3B window golden: 7-row MA + YTD frames re-derive all 616 rows") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    // `3B. Advanced Window Functions...` — re-derive moving_avg_7d
    // (ROWS 6 PRECEDING, round 2) and year_to_date_revenue (cumulative
    // per EXTRACT(YEAR), ROWS UNBOUNDED PRECEDING) — OUR q3b frames —
    // from the published daily revenue column; exact decimal compare.
    val g = spark.read.option("header", "true")
      .csv(s"$ResultsDir/3B. Advanced Window Functions moving averages and cumulative measures.CSV")
      .select(to_date($"day").as("day"),
        $"revenue".cast(DecimalType(18, 2)),
        $"moving_avg_7d".cast(DecimalType(18, 2)).as("published_ma"),
        $"year_to_date_revenue".cast(DecimalType(18, 2))
          .as("published_ytd"))
    assert(g.count() == 616)
    val ma7 = Window.orderBy($"day").rowsBetween(-6, 0)
    val ytd = Window.partitionBy(year($"day")).orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, 0)
    val derived = g
      .withColumn("derived_ma",
        round(avg($"revenue").over(ma7), 2).cast(DecimalType(18, 2)))
      .withColumn("derived_ytd",
        sum($"revenue").over(ytd).cast(DecimalType(18, 2)))
    val badYtd = derived
      .filter($"published_ytd" =!= $"derived_ytd").count()
    assert(badYtd == 0, s"$badYtd rows where YTD cumulative diverges")
    val badMa = derived.filter($"published_ma" =!= $"derived_ma").count()
    assert(badMa == 0, s"$badMa rows where the 7-row MA diverges")
  }

  test("4B correlated golden: every row satisfies the published predicate") {
    import spark.implicits._
    // `4B...correlated subqueries for comparative analysis.CSV` — the
    // file carries BOTH sides of the correlated compare; assert the
    // WHERE (product avg > category avg) holds on every row, the
    // category average is a single value per category (it came from
    // one uncorrelated subquery), and the published ordering is
    // avg_price_product DESC.
    val g = spark.read.option("header", "true")
      .csv(s"$ResultsDir/4B. Complex Filtering and Subqueries correlated subqueries for comparative analysis.CSV")
      .select($"product_id", $"category_name_eng",
        $"avg_price_product".cast("double"),
        $"avg_price_category".cast("double"))
    assert(g.count() == 11541)
    assert(g.filter($"avg_price_product" <= $"avg_price_category")
      .count() == 0, "a row violates product_avg > category_avg")
    val multiAvg = g.groupBy($"category_name_eng")
      .agg(countDistinct($"avg_price_category").as("n"))
      .filter($"n" > 1).count()
    assert(multiAvg == 0, "category average not constant per category")
    val idx = g.withColumn("i", monotonically_increasing_id())
    val disorder = idx.as("a").join(idx.as("b"),
      $"a.i" === $"b.i" - 1 &&
        $"a.avg_price_product" < $"b.avg_price_product").count()
    assert(disorder == 0, "published rows not in avg_price_product DESC order")
  }

  test("4A EXISTS-chain golden: 35 distinct well-formed product ids") {
    import spark.implicits._
    val g = spark.read.option("header", "true")
      .csv(s"$ResultsDir/4A. Complex Filtering and Subqueries Multi-dimensional filtering with EXISTSIN clauses.CSV")
    assert(g.count() == 35)
    assert(g.select($"product_id").distinct().count() == 35)
    assert(g.filter(!$"product_id".rlike("^[0-9a-f]{32}$")).count() == 0,
      "a product id is not 32-char lowercase hex")
  }

  test("5A LTV golden: avg_receipt divides by PAYMENTS, not orders") {
    import spark.implicits._
    // `5A...CustomerProduct profitability analysis.CSV` — re-derive
    // the receipt count as ltv/avg_receipt and assert (a) it is a
    // whole number under our round-2 formula, (b) never below the
    // order count, and (c) strictly above it somewhere — the rows
    // with orders=1 but avg=ltv/2 are what make 5A PAYMENT-grain
    // (the reference divides by fact_payment rows; our q5c mirrors
    // this). Also pins the top-20 cut and the LTV DESC order.
    val g = spark.read.option("header", "true")
      .csv(s"$ResultsDir/5A. Business Intelligence Metrics CustomerProduct profitability analysis.CSV")
      .select($"customer_unique_id", $"ltv_revenue".cast("double"),
        $"orders".cast("long"), $"avg_receipt_value".cast("double"))
    assert(g.count() == 20)
    val derived = g.withColumn("receipts",
      round($"ltv_revenue" / $"avg_receipt_value").cast("long"))
    val badAvg = derived.filter(
      abs(round($"ltv_revenue" / $"receipts", 2) - $"avg_receipt_value")
        > 0.005).count()
    assert(badAvg == 0, "avg_receipt is not round(ltv / receipts, 2)")
    assert(derived.filter($"receipts" < $"orders").count() == 0,
      "receipt count below order count")
    assert(derived.filter($"receipts" > $"orders").count() > 0,
      "no multi-payment row — 5A would be order-grain, not payment-grain")
    assert(derived.agg(max($"ltv_revenue")).head.getDouble(0) == 13664.08,
      "top LTV != published 13664.08")
    val idx = derived.withColumn("i", monotonically_increasing_id())
    val disorder = idx.as("a").join(idx.as("b"),
      $"a.i" === $"b.i" - 1 && $"a.ltv_revenue" < $"b.ltv_revenue").count()
    assert(disorder == 0, "published rows not in LTV DESC order")
  }

  test("5B KPI golden: delay averages ONLY late deliveries (NULL when none)") {
    import spark.implicits._
    // `5B...Performance KPI calculations...CSV` — the published
    // avg_delivery_delay_days is AVG(delay) FILTERED to
    // on_time = false (reference 5B `AVG(CASE WHEN on_time IS false
    // THEN delay END)`): a month with rate 100% (no late rows) or
    // rate NULL (nothing delivered) must have delay NULL, and every
    // month with a late delivery must have one. Anchors pin the
    // Black-Friday dip row.
    val g = spark.read.option("header", "true").option("nullValue", "NULL")
      .csv(s"$ResultsDir/5B. Business Intelligence Metrics Performance KPI calculations specific to your domain.CSV")
      .select($"year".cast("int"), $"month".cast("int"),
        $"orders".cast("long"),
        $"on_time_delivery_rate_pct".cast("double").as("rate"),
        $"avg_delivery_delay_days".cast("double").as("delay"),
        $"avg_review_score".cast("double").as("review"))
    assert(g.count() == 24)
    val inconsistent = g.filter(
      ($"delay".isNull && !($"rate".isNull || $"rate" === 100.0)) ||
        ($"delay".isNotNull && ($"rate".isNull || $"rate" === 100.0)))
      .count()
    assert(inconsistent == 0,
      "delay NULL-ness diverges from late-only filtered-AVG semantics")
    assert(g.filter($"review" < 1.0 || $"review" > 5.0).count() == 0)
    val bf = g.filter($"year" === 2017 && $"month" === 11).head
    assert(bf.getLong(2) == 8665 && bf.getDouble(3) == 88.09,
      "Black-Friday anchor row diverges from published 5B")
  }

  test("1B seasonal golden: index formula re-derives all 12 months") {
    import spark.implicits._
    // `1B.Time-based Trend Analysis seasonal pattern identification.csv`
    // — re-derive seasonal_index with OUR q1b formula
    // (ROUND(month_avg / overall_avg, 3)) from the file's own columns,
    // assert the overall average is one constant (it came from one
    // uncorrelated aggregate), and the month_name mapping matches our
    // dim_time derivation.
    val g = spark.read.option("header", "true")
      .csv(s"$ResultsDir/1B.Time-based Trend Analysis seasonal pattern identification.csv")
      .select($"month".cast("int"), $"month_name",
        $"avg_rev_month".cast("double"),
        $"avg_rev_overall".cast("double"),
        $"seasonal_index".cast("double").as("published_index"))
    assert(g.count() == 12 &&
      g.select($"month").distinct().count() == 12)
    assert(g.select($"avg_rev_overall").distinct().count() == 1,
      "overall average not constant across rows")
    val bad = g.filter(
      abs(round($"avg_rev_month" / $"avg_rev_overall", 3)
        - $"published_index") > 0.0005).count()
    assert(bad == 0, s"$bad months where the seasonal index diverges")
    val badName = g.filter($"month_name" =!=
      date_format(make_date(lit(2017), $"month", lit(1)), "MMMM")).count()
    assert(badName == 0, s"$badName rows where month_name diverges")
  }

  test("2B hierarchy golden: our rollup reproduces all 33,026 rows") {
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    // `2B.Drill-down and Roll-up Operations Hierarchical dimension
    // analysis.csv` — strip the published subtotal rows, run OUR
    // ROLLUP(category, product) + label mapping (the q2b shape) over
    // the remaining detail rows, and the full 33,026-row result must
    // come back value-for-value (exact decimal sums).
    val raw = spark.read.option("header", "true").option("nullValue", "NULL")
      .csv(s"$ResultsDir/2B.Drill-down and Roll-up Operations Hierarchical dimension analysis.csv")
      .select($"category", $"product_or_total",
        $"revenue".cast(DecimalType(18, 2)))
    val detail = raw.filter(
      !$"product_or_total".isin("Category Subtotal", "Grand Total"))
    val rolled = detail
      .rollup($"category", $"product_or_total")
      .agg(sum($"revenue").cast(DecimalType(18, 2)).as("revenue"),
        when(grouping($"category") === 1, "All Categories")
          .otherwise($"category").as("cat_label"),
        when(grouping($"category") === 1, "Grand Total")
          .when(grouping($"product_or_total") === 1, "Category Subtotal")
          .otherwise($"product_or_total").as("prod_label"))
      .select($"cat_label".as("category"),
        $"prod_label".as("product_or_total"), $"revenue")
    assert(rolled.count() == 33026L)
    assert(raw.exceptAll(rolled).count() == 0 &&
      rolled.exceptAll(raw).count() == 0,
      "rollup output diverges from the published 2B golden")
  }

  test("seasonal index (1B grain): month-of-year pools across years") {
    import spark.implicits._
    // daily revenue: Jan-2016 has 10+20 (two days), Jan-2017 has 30,
    // Feb-2016 has 40 → month_avg(Jan) = (10+20+30)/3 = 20,
    // overall daily avg = (10+20+30+40)/4 = 25 → index(Jan) = 0.8
    val daily = Seq(
      ("2016-01-05", 1, 10.0), ("2016-01-20", 1, 20.0),
      ("2017-01-11", 1, 30.0), ("2016-02-01", 2, 40.0))
      .toDF("o_day", "o_month", "rev")
    val m = daily.groupBy($"o_month")
      .agg((sum($"rev") / count(lit(1))).as("avg_rev_month"))
    val overall = daily.agg((sum($"rev") / count(lit(1))).as("o")).head.getDouble(0)
    val jan = m.filter($"o_month" === 1).head.getDouble(1)
    assert(math.abs(jan / overall - 0.8) < 1e-9)
  }
}
