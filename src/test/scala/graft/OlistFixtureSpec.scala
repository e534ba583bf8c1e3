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
