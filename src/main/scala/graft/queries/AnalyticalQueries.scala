package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.Exact

/** The reference's 10 analytical query patterns (`Database/TASK 2A SQL
  * Analytical Queries.sql`, SURVEY.md §2.3–§2.7) re-expressed
  * Spark-first over the harness star schema (role mapping in
  * FIXTURES.md §4: fact_order_lines→lineitem, dims→customer/part/
  * supplier/nation, category→brand/mktsegment, dates from
  * o_orderdate/l_shipdate).
  *
  * Scale notes (100 TB design): the only fact⋈fact join is
  * lineitem⋈orders on the shuffle key `orderkey` — co-partitioned,
  * AQE-safe. Constant-cardinality dims (nation: 25 rows at ANY scale)
  * keep a static `broadcast()` hint; member-scale dims
  * (customer/part/supplier — 10⁸–10⁹ rows at 100 TB) carry NO hint:
  * an unconditional hint there is a driver OOM at the 8 GB broadcast
  * cap, and AQE already picks a broadcast join at runtime whenever
  * the dim actually fits (PlanSpec asserts it does). Aggregates use
  * map-side-combining hash aggregation; windows partition on
  * low-skew keys (month/nation). Exact-decimal sums (Exact.dsum)
  * keep the oracle hash stable without changing the plan shape.
  */
object AnalyticalQueries {

  /** Per-line revenue used everywhere: extendedprice·(1−discount). */
  private val revSql =
    "CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))"

  private def revenue(df: DataFrame): org.apache.spark.sql.Column = {
    import df.sparkSession.implicits._
    Exact.revenueExpr($"l_extendedprice", $"l_discount")
  }

  /** Order-grain exact revenue: lineitem pre-aggregated to
    * (l_orderkey, rev DECIMAL(38,6)) BEFORE any join (guide §2.3
    * "aggregate before you shuffle", r17 optimization round). Every
    * headline consumer that joins lineitem⋈orders only to aggregate
    * revenue at order grain or coarser now collapses the line mass
    * map-side first: at 100 TB the orderkey-grain exchange carries
    * ~¼ the rows at ~⅛ the bytes of the raw line columns, and the
    * orders/customer joins probe order-grain rows instead of line-
    * grain. Decimal sums are exact and associative, so the two-level
    * sum (per-order, then per-group) is bit-identical to the flat
    * per-group sum the oracle computes — the q5a/q1b precedent.
    * NULL-revenue lines: `sum` skips NULL at both levels, and an
    * order whose every line is NULL-revenue still emits its (key,
    * NULL) row, so COUNT-style consumers see the same row set.
    */
  private[queries] def orderRevenue(t: Tables): DataFrame = {
    val li = t.lineitem
    import li.sparkSession.implicits._
    li.groupBy($"l_orderkey")
      .agg(sum(revenue(li).cast(DecimalType(38, 6))).as("rev"))
  }

  /** (n_name, c_custkey, revenue DOUBLE) — the customer-revenue grain
    * shared verbatim by q3a, q3a_dist and q21 (their oracles all open
    * with the identical `rev` CTE). Built on [[orderRevenue]]: the
    * dim joins probe order-grain rows, and the two-level exact-decimal
    * sum string-roundtrips to the same double as the flat line-grain
    * sum the oracle computes.
    */
  private[queries] def nationCustRevenue(t: Tables): DataFrame = {
    val li = t.lineitem
    import li.sparkSession.implicits._
    orderRevenue(t)
      .join(t.orders, $"l_orderkey" === $"o_orderkey")
      .join(t.customer, $"o_custkey" === $"c_custkey")
      .join(broadcast(t.nation), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name", $"c_custkey")
      .agg(Exact.toDouble(sum($"rev")).as("revenue"))
  }

  /** 1A — monthly revenue + YoY growth via LAG
    * (ref `TASK 2A…sql:5-36`: LAG(revenue) PARTITION BY month ORDER BY year).
    */
  val q1aYoyGrowth: GraftQuery = GraftQuery(
    "q1a_yoy_growth",
    s"""WITH rev AS (
       |  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       |         CAST(month(o_orderdate) AS INTEGER) AS o_month,
       |         CAST(CAST(SUM($revSql) AS VARCHAR) AS DOUBLE) AS revenue
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  GROUP BY 1, 2)
       |SELECT o_year, o_month, revenue,
       |       LAG(revenue) OVER (PARTITION BY o_month ORDER BY o_year)
       |         AS prev_year_revenue,
       |       (revenue - LAG(revenue) OVER (PARTITION BY o_month ORDER BY o_year))
       |         / NULLIF(LAG(revenue) OVER (PARTITION BY o_month ORDER BY o_year), 0)
       |         * 100 AS yoy_growth_pct
       |FROM rev""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val t = Tables(spark, dir)
    val rev = orderRevenue(t)
      .join(t.orders, $"l_orderkey" === $"o_orderkey")
      .groupBy(year($"o_orderdate").as("o_year"), month($"o_orderdate").as("o_month"))
      .agg(Exact.toDouble(sum($"rev")).as("revenue"))
    val w = Window.partitionBy($"o_month").orderBy($"o_year")
    rev
      .withColumn("prev_year_revenue", lag($"revenue", 1).over(w))
      // NULLIF div-guard mirrors the reference (TASK 2A…sql:34): a
      // zero prior-year month yields NULL growth, not Infinity.
      .withColumn("yoy_growth_pct",
        when($"prev_year_revenue" =!= 0,
          ($"revenue" - $"prev_year_revenue") / $"prev_year_revenue" * 100))
  }

  /** 1B — seasonal index at the reference's grain (ref `TASK 2A…sql:43-66`):
    * daily revenue → average daily revenue per month-of-year (same calendar
    * month pooled across years) vs the overall daily average, via CROSS JOIN
    * of a one-row aggregate. 12 output rows, one per calendar month.
    */
  val q1bSeasonalIndex: GraftQuery = GraftQuery(
    "q1b_seasonal_index",
    s"""WITH daily AS (
       |  SELECT CAST(o_orderdate AS DATE) AS o_day,
       |         CAST(month(o_orderdate) AS INTEGER) AS o_month,
       |         SUM($revSql) AS rev_dec
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  GROUP BY 1, 2),
       |m AS (
       |  SELECT o_month,
       |         CAST(CAST(SUM(rev_dec) AS VARCHAR) AS DOUBLE) / COUNT(*)
       |           AS avg_rev_month
       |  FROM daily GROUP BY 1),
       |o AS (SELECT CAST(CAST(SUM(rev_dec) AS VARCHAR) AS DOUBLE)
       |             / COUNT(*) AS avg_rev_overall FROM daily)
       |SELECT m.o_month, m.avg_rev_month, o.avg_rev_overall,
       |       m.avg_rev_month / NULLIF(o.avg_rev_overall, 0)
       |         AS seasonal_index
       |FROM m CROSS JOIN o""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val t = Tables(spark, dir)
    // daily revenue stays DECIMAL so both averaging levels reuse the
    // exact sums (no double→decimal re-cast of derived numbers)
    val daily = orderRevenue(t)
      .join(t.orders, $"l_orderkey" === $"o_orderkey")
      .groupBy(to_date($"o_orderdate").as("o_day"),
        month($"o_orderdate").as("o_month"))
      .agg(sum($"rev").as("rev_dec"))
    val m = daily.groupBy($"o_month")
      .agg((Exact.toDouble(sum($"rev_dec")) / count(lit(1))).as("avg_rev_month"))
    // scalar overall average: one-row aggregate, broadcast cross join
    val overall = daily.agg(
      (Exact.toDouble(sum($"rev_dec")) / count(lit(1))).as("avg_rev_overall"))
    m.crossJoin(broadcast(overall))
      .withColumn("seasonal_index",
        when($"avg_rev_overall" =!= 0, $"avg_rev_month" / $"avg_rev_overall"))
      .select("o_month", "avg_rev_month", "avg_rev_overall", "seasonal_index")
  }

  /** 2A — GROUPING SETS (year,month,segment) → (y,m) → (y) → () with
    * GROUPING() labels (ref `TASK 2A…sql:73-105`).
    *
    * The twin's `HAVING COUNT(*) > 0` pins the EMPTY-INPUT grand
    * total: Spark expands grouping sets into a keyed aggregate
    * (Expand + groupBy grouping_id), so zero input rows → zero output
    * rows for EVERY set including (); DuckDB computes () as a global
    * aggregate and would emit a lone COUNT=0 grand-total row. The
    * HAVING is a no-op on non-empty groups (emitted groups always
    * have COUNT(*) ≥ 1) and aligns the empty-warehouse shape — the
    * degenerate-dir twin audit device (SURVEY §8.9).
    */
  val q2aGroupingSets: GraftQuery = GraftQuery(
    "q2a_grouping_sets",
    s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       |       CAST(month(o_orderdate) AS INTEGER) AS o_month,
       |       c_mktsegment AS segment,
       |       CASE WHEN GROUPING(year(o_orderdate)) = 1 THEN 'GRAND TOTAL'
       |            WHEN GROUPING(month(o_orderdate)) = 1 THEN 'YEAR TOTAL'
       |            WHEN GROUPING(c_mktsegment) = 1 THEN 'MONTH TOTAL'
       |            ELSE 'DETAIL' END AS row_type,
       |       CAST(CAST(SUM($revSql) AS VARCHAR) AS DOUBLE) AS revenue,
       |       COUNT(DISTINCT o_orderkey) AS n_orders
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |GROUP BY GROUPING SETS (
       |  (year(o_orderdate), month(o_orderdate), c_mktsegment),
       |  (year(o_orderdate), month(o_orderdate)),
       |  (year(o_orderdate)), ())
       |HAVING COUNT(*) > 0""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val t = Tables(spark, dir)
    // pre-aggregate to order grain BEFORE the joins and the 4-way
    // grouping-sets expand (orderRevenue, guide §2.3). An order has
    // exactly ONE (year, month) and ONE segment, so at every rollup
    // level each order contributes exactly one order-grain row —
    // countDistinct(o_orderkey) degenerates to a plain count(*): no
    // distinct expansion at all (the oracle keeps COUNT(DISTINCT),
    // which is provably equal on this data model). Pre-agg-first
    // additionally means the orders and customer joins probe order-
    // grain rows, not line-grain (r17: 4× fewer join rows; at 100 TB
    // the only full-mass exchange left is lineitem's own orderkey
    // pre-agg shuffle).
    val base = orderRevenue(t)
      .join(t.orders, $"l_orderkey" === $"o_orderkey")
      .join(t.customer, $"o_custkey" === $"c_custkey")
      .select(
        year($"o_orderdate").as("o_year"),
        month($"o_orderdate").as("o_month"),
        $"c_mktsegment".as("segment"),
        $"rev")
    base
      .groupingSets(
        Seq(Seq($"o_year", $"o_month", $"segment"),
            Seq($"o_year", $"o_month"),
            Seq($"o_year"),
            Seq()),
        $"o_year", $"o_month", $"segment")
      .agg(
        when(grouping($"o_year") === 1, "GRAND TOTAL")
          .when(grouping($"o_month") === 1, "YEAR TOTAL")
          .when(grouping($"segment") === 1, "MONTH TOTAL")
          .otherwise("DETAIL").as("row_type"),
        Exact.toDouble(sum($"rev")).as("revenue"),
        count(lit(1)).as("n_orders"))
      .select("o_year", "o_month", "segment", "row_type", "revenue", "n_orders")
  }

  /** 2B — ROLLUP brand → part with subtotal/grand-total labels
    * (ref `TASK 2A…sql:110-123`). Twin `HAVING COUNT(*) > 0` = the
    * q2a empty-input grand-total device (no-op on non-empty groups).
    */
  val q2bRollup: GraftQuery = GraftQuery(
    "q2b_rollup",
    s"""SELECT p_brand,
       |       p_partkey,
       |       CASE WHEN GROUPING(p_brand) = 1 THEN 'GRAND TOTAL'
       |            WHEN GROUPING(p_partkey) = 1 THEN 'BRAND TOTAL'
       |            ELSE 'DETAIL' END AS row_type,
       |       CAST(CAST(SUM($revSql) AS VARCHAR) AS DOUBLE) AS revenue
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY ROLLUP (p_brand, p_partkey)
       |HAVING COUNT(*) > 0""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val t = Tables(spark, dir)
    t.lineitem
      .join(t.part, $"l_partkey" === $"p_partkey")
      .select($"p_brand", $"p_partkey",
        revenue(t.lineitem).cast(DecimalType(38, 6)).as("rev"))
      .rollup($"p_brand", $"p_partkey")
      .agg(
        when(grouping($"p_brand") === 1, "GRAND TOTAL")
          .when(grouping($"p_partkey") === 1, "BRAND TOTAL")
          .otherwise("DETAIL").as("row_type"),
        Exact.toDouble(sum($"rev")).as("revenue"))
      .select("p_brand", "p_partkey", "row_type", "revenue")
  }

  /** 3A — RANK + NTILE(100) of customers within nation by revenue
    * (ref `TASK 2A…sql:129-144`). Order is made total (revenue DESC,
    * custkey ASC) so NTILE is deterministic across engines.
    *
    * Scale note: the window partitions by nation (25 groups), so each
    * task sorts ~1/25th of all customers — ~60 M rows/task at 100 TB.
    * That sort is spill-safe (ExternalSorter) but single-threaded per
    * nation; the exact-rank scale path is
    * [[graft.operators.DistributedRank]] (range-repartitioned sort +
    * per-partition offsets — many tasks per nation), with this window
    * form kept as the oracle-checked baseline.
    */
  val q3aRankNtile: GraftQuery = GraftQuery(
    "q3a_rank_ntile",
    s"""WITH rev AS (
       |  SELECT n_name, c_custkey,
       |         CAST(CAST(SUM($revSql) AS VARCHAR) AS DOUBLE) AS revenue
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation ON c_nationkey = n_nationkey
       |  GROUP BY 1, 2)
       |SELECT n_name, c_custkey, revenue,
       |       CAST(RANK() OVER (PARTITION BY n_name
       |         ORDER BY revenue DESC, c_custkey) AS INTEGER) AS rev_rank,
       |       CAST(NTILE(100) OVER (PARTITION BY n_name
       |         ORDER BY revenue DESC, c_custkey) AS INTEGER) AS percentile_band
       |FROM rev""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val t = Tables(spark, dir)
    val rev = nationCustRevenue(t)
    val w = Window.partitionBy($"n_name").orderBy($"revenue".desc, $"c_custkey")
    rev
      .withColumn("rev_rank", rank().over(w))
      .withColumn("percentile_band", ntile(100).over(w))
  }

  /** 3A-dist — the SAME query through the
    * [[graft.operators.DistributedRank]] scale path (range-repartition
    * + per-partition offsets — many tasks per nation instead of one),
    * hash-checked against the identical oracle as q3a. The revenue
    * aggregate is converted to DOUBLE before ranking so the ordering
    * and output column match the window baseline bit-for-bit.
    */
  val q3aRankNtileDist: GraftQuery = GraftQuery(
    "q3a_rank_ntile_dist",
    q3aRankNtile.oracle.get) { (spark, dir) =>
    import spark.implicits._
    val t = Tables(spark, dir)
    val rev = nationCustRevenue(t)
    graft.operators.DistributedRank.rankNtile(
      rev,
      groupCols = Seq("n_name"),
      orderCols = Seq($"revenue".desc, $"c_custkey"),
      ntiles = 100,
      rankName = "rev_rank",
      ntileName = "percentile_band")
      // per-nation ranks are Int-bounded; the reference CASTs to
      // INTEGER, so narrow the operator's Long at the output boundary
      .withColumn("rev_rank", $"rev_rank".cast("int"))
  }

  /** 3B — daily revenue, 7-day trailing moving average, YTD cumulative
    * (ref `TASK 2A…sql:149-164`). Window sums stay DECIMAL (exact,
    * order-free) and convert to DOUBLE only at the output.
    */
  val q3bMovingAvgYtd: GraftQuery = GraftQuery(
    "q3b_moving_avg_ytd",
    s"""WITH daily AS (
       |  SELECT CAST(l_shipdate AS DATE) AS ship_day,
       |         SUM($revSql) AS rev
       |  FROM lineitem WHERE l_shipdate IS NOT NULL GROUP BY 1)
       |SELECT CAST(ship_day AS VARCHAR) AS ship_day,
       |       CAST(CAST(rev AS VARCHAR) AS DOUBLE) AS revenue,
       |       CAST(CAST(SUM(rev) OVER (ORDER BY ship_day
       |           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
       |         / COUNT(*) OVER (ORDER BY ship_day
       |           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS moving_avg_7d,
       |       CAST(CAST(SUM(rev) OVER (PARTITION BY year(ship_day) ORDER BY ship_day
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
       |         AS ytd_revenue
       |FROM daily""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val t = Tables(spark, dir)
    // ship_day is a DATE on both sides — date→timestamp would re-introduce
    // a session-timezone dependency (ADVICE r1) for zero semantic gain.
    // An undateable shipment has no position on the day spine, so both
    // engines exclude it (the q15/q24c convention): unfiltered, the NULL
    // day rides the window frames NULLS-FIRST in Spark and NULLS-LAST in
    // DuckDB — different moving averages for the same mixed feed
    // (flushed by the r13 mixed-null fixture, SURVEY §8.11).
    val daily = t.lineitem
      .filter($"l_shipdate".isNotNull)
      .groupBy(to_date($"l_shipdate").as("ship_day"))
      .agg(sum(revenue(t.lineitem).cast(DecimalType(38, 6))).as("rev"))
    val wMa  = Window.orderBy($"ship_day").rowsBetween(-6, 0)
    val wYtd = Window.partitionBy(year($"ship_day")).orderBy($"ship_day")
      .rowsBetween(Window.unboundedPreceding, 0)
    daily
      .withColumn("moving_avg_7d",
        Exact.toDouble(sum($"rev").over(wMa)) / count(lit(1)).over(wMa))
      .withColumn("ytd_revenue", Exact.toDouble(sum($"rev").over(wYtd)))
      // ISO string at the output boundary: engine-identical repr, no
      // date→timestamp/timezone dependency in the oracle compare
      .select($"ship_day".cast(StringType).as("ship_day"),
        Exact.toDouble($"rev").as("revenue"),
        $"moving_avg_7d", $"ytd_revenue")
  }

  /** 3C — the rest of the rank-family window surface the reference's
    * report queries lean on (`TASK 2A…sql` §3 uses RANK/NTILE; DAX §7.1
    * uses percentile positions): DENSE_RANK, PERCENT_RANK, CUME_DIST,
    * LEAD and NTH_VALUE over one shared window. Ordering is total and
    * pure-integer (n_orders DESC, c_custkey) so every function is
    * deterministic cross-engine; the fraction outputs are int/int
    * divisions, which IEEE-round identically in both engines.
    *
    * Scale: one hash agg on o_custkey (the natural shuffle key), one
    * window partitioned by mktsegment (5 groups). At 100 TB the
    * per-segment sort is the bottleneck; the exact-rank scale path is
    * [[graft.operators.DistributedRank]] as pinned for q3a — this query
    * exists to cover the *function surface*, not a new plan shape.
    */
  val q3cWindowExtras: GraftQuery = GraftQuery(
    "q3c_window_extras",
    """WITH cnt AS (
      |  SELECT c_mktsegment, c_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2)
      |SELECT c_mktsegment, c_custkey, n_orders,
      |       CAST(DENSE_RANK() OVER w AS INTEGER) AS drank,
      |       PERCENT_RANK() OVER w AS pct_rank,
      |       CUME_DIST() OVER w AS cume,
      |       CAST(LEAD(n_orders, 1, 0) OVER w AS BIGINT) AS next_n,
      |       CAST(NTH_VALUE(n_orders, 3) OVER (PARTITION BY c_mktsegment
      |         ORDER BY n_orders DESC, c_custkey
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |         AS BIGINT) AS third_n
      |FROM cnt
      |WINDOW w AS (PARTITION BY c_mktsegment
      |             ORDER BY n_orders DESC, c_custkey)""".stripMargin) {
    (spark, dir) =>
      import spark.implicits._
      val t = Tables(spark, dir)
      val cnt = t.orders
        .join(t.customer, $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment", $"c_custkey")
        .agg(count(lit(1)).as("n_orders"))
      val w = Window.partitionBy($"c_mktsegment")
        .orderBy($"n_orders".desc, $"c_custkey")
      val wFull = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      cnt
        .withColumn("drank", dense_rank().over(w))
        .withColumn("pct_rank", percent_rank().over(w))
        .withColumn("cume", cume_dist().over(w))
        .withColumn("next_n", lead($"n_orders", 1, 0).over(w).cast(LongType))
        .withColumn("third_n", nth_value($"n_orders", 3).over(wFull))
  }

  /** 4A — triple EXISTS/semi-join chain: parts in ≥3 distinct orders ∧
    * high return rate ∧ bought by BUILDING-segment customers
    * (ref `TASK 2A…sql:170-203`: conjunctive CTE semi-joins + HAVING).
    */
  val q4aSemiJoinChain: GraftQuery = GraftQuery(
    "q4a_semi_join_chain",
    """WITH popular AS (
      |  SELECT l_partkey FROM lineitem
      |  GROUP BY 1 HAVING COUNT(DISTINCT l_orderkey) >= 3),
      |returned AS (
      |  SELECT l_partkey FROM lineitem
      |  GROUP BY 1
      |  HAVING CAST(COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS DOUBLE)
      |         / COUNT(*) > 0.3),
      |building AS (
      |  SELECT DISTINCT l_partkey
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  WHERE c_mktsegment = 'BUILDING')
      |SELECT p_partkey, p_name, p_brand FROM part
      |WHERE p_partkey IN (SELECT l_partkey FROM popular)
      |  AND p_partkey IN (SELECT l_partkey FROM returned)
      |  AND p_partkey IN (SELECT l_partkey FROM building)""".stripMargin) {
    (spark, dir) =>
      import spark.implicits._
      val t  = Tables(spark, dir)
      val li = t.lineitem
      // popular ∧ returned fused into ONE two-phase aggregation: the
      // (part, order) pre-agg replaces countDistinct's expand — phase 2
      // counts pre-deduped orders and sums the carried line counters.
      // r18 A/B'd and REVERTED: sharing this pre-agg with the building
      // branch (ReuseExchange via the q12o always-true-guard device)
      // does NOT fire — the building branch's orders join infers
      // IsNotNull(l_orderkey) and pushes it into the scan, so the two
      // partial-agg subtrees can never canonicalize equal (before/
      // after dumps in plans/r18/: the shared shape kept 5 scans and
      // ADDED an exchange; measured +4% locally, worse at scale too
      // since the pair grain ≈ line grain here).
      val popularReturned = li
        .groupBy($"l_partkey", $"l_orderkey")
        .agg(count(when($"l_returnflag" === "R", 1)).as("n_ret"),
          count(lit(1)).as("n_lines"))
        .groupBy($"l_partkey")
        .agg(count(lit(1)).as("n_ord"),
          (sum($"n_ret").cast(DoubleType) / sum($"n_lines")).as("ret_rate"))
        .filter($"n_ord" >= 3 && $"ret_rate" > 0.3)
        .select($"l_partkey")
      val building = li
        .join(t.orders, $"l_orderkey" === $"o_orderkey")
        .join(t.customer.filter($"c_mktsegment" === "BUILDING"),
          $"o_custkey" === $"c_custkey")
        .select($"l_partkey").distinct()
      t.part
        .join(popularReturned, $"p_partkey" === popularReturned("l_partkey"),
          "left_semi")
        .join(building, $"p_partkey" === building("l_partkey"), "left_semi")
        .select($"p_partkey", $"p_name", $"p_brand")
  }

  /** 4B — correlated compare: parts priced above their brand average
    * (ref `TASK 2A…sql:208-236`: avg_price_product > avg_price_category).
    */
  val q4bPriceVsBrand: GraftQuery = GraftQuery(
    "q4b_price_vs_brand",
    """WITH pp AS (
      |  SELECT p_partkey, p_brand,
      |         SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS price_dec,
      |         COUNT(*) AS n_lines
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1, 2),
      |pb AS (
      |  SELECT p_brand,
      |         CAST(CAST(SUM(price_dec) AS VARCHAR) AS DOUBLE)
      |           / SUM(n_lines) AS avg_price_brand
      |  FROM pp GROUP BY 1)
      |SELECT pp.p_partkey, pp.p_brand,
      |       CAST(CAST(pp.price_dec AS VARCHAR) AS DOUBLE) / pp.n_lines
      |         AS avg_price_part,
      |       pb.avg_price_brand
      |FROM pp JOIN pb ON pp.p_brand = pb.p_brand
      |WHERE CAST(CAST(pp.price_dec AS VARCHAR) AS DOUBLE) / pp.n_lines
      |      > pb.avg_price_brand""".stripMargin) {
    (spark, dir) =>
      import spark.implicits._
      val t = Tables(spark, dir)
      // carry (decimal sum, count) so the brand (line-grain) average
      // reuses exact sums — no double→decimal re-cast of derived values.
      // r18 (guide §2.3, the orderRevenue device on the part dim):
      // lineitem collapses to partkey grain map-side BEFORE the part
      // join, so the join probes one row per part instead of the full
      // line mass — at 100 TB the only line-grain exchange is the
      // partkey pre-agg, which AQE sizes. The post-join re-group
      // keeps the original line-grain join semantics bit-exact even
      // under degenerate inputs (a duplicated p_partkey row of the
      // same brand doubles the sums in BOTH shapes — decimal sums of
      // sums are associative); it costs no exchange because the join
      // output is already partkey-partitioned.
      val liPart = t.lineitem
        .groupBy($"l_partkey")
        .agg(sum($"l_extendedprice".cast(DecimalType(38, 6))).as("price_dec0"),
          count(lit(1)).as("n_lines0"))
      val pp = liPart
        .join(t.part, $"l_partkey" === $"p_partkey")
        .groupBy($"p_partkey", $"p_brand")
        .agg(sum($"price_dec0").as("price_dec"),
          sum($"n_lines0").as("n_lines"))
      val pb = pp.groupBy($"p_brand")
        .agg((Exact.toDouble(sum($"price_dec")) / sum($"n_lines"))
          .as("avg_price_brand"))
      pp.join(broadcast(pb), Seq("p_brand"))
        .withColumn("avg_price_part", Exact.toDouble($"price_dec") / $"n_lines")
        .filter($"avg_price_part" > $"avg_price_brand")
        .select($"p_partkey", $"p_brand", $"avg_price_part", $"avg_price_brand")
  }

  /** 5A — top-20 customers by lifetime value (ref `TASK 2A…sql:241-251`).
    * Total order (revenue DESC, custkey ASC) keeps the LIMIT
    * deterministic; Spark plans it as TakeOrderedAndProject.
    */
  val q5aTopLtv: GraftQuery = GraftQuery(
    "q5a_top_ltv",
    s"""WITH per_order AS (
       |  SELECT o_custkey, o_orderkey, SUM($revSql) AS rev
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  GROUP BY 1, 2)
       |SELECT c_custkey, c_name,
       |       CAST(CAST(SUM(rev) AS VARCHAR) AS DOUBLE) AS ltv_revenue,
       |       COUNT(*) AS n_orders,
       |       CAST(CAST(SUM(rev) AS VARCHAR) AS DOUBLE) / COUNT(*)
       |         AS avg_receipt_value
       |FROM per_order
       |JOIN customer ON o_custkey = c_custkey
       |GROUP BY 1, 2
       |ORDER BY ltv_revenue DESC, c_custkey
       |LIMIT 20""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val t = Tables(spark, dir)
    // order-grain pre-agg turns countDistinct into a plain count and
    // shrinks the per-customer shuffle to one row per order; since
    // r17 the pre-agg happens BEFORE the orders join (orderRevenue,
    // guide §2.3) so the join probes order-grain rows too
    val perOrder = orderRevenue(t)
      .join(t.orders, $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey", $"rev")
    perOrder
      .join(t.customer, $"o_custkey" === $"c_custkey")
      .groupBy($"c_custkey", $"c_name")
      .agg(
        Exact.toDouble(sum($"rev")).as("ltv_revenue"),
        count(lit(1)).as("n_orders"),
        // ref 5A's avg_receipt_value (AVG(payment_value) analog at
        // order grain, `TASK 2A…sql:246`)
        (Exact.toDouble(sum($"rev")) / count(lit(1)))
          .as("avg_receipt_value"))
      .orderBy($"ltv_revenue".desc, $"c_custkey")
      .limit(20)
  }

  /** 5B — monthly KPI sheet with conditional aggregates and the
    * reference's three-valued on-time logic (ref `TASK 2A…sql:256-296`;
    * on-time NULL case excluded from the rate — SURVEY §1.3).
    * Analog: ship within 30 days = on time; open orders ('O' status
    * never delivered analog would be NULL) → NULL.
    */
  val q5bMonthlyKpis: GraftQuery = GraftQuery(
    "q5b_monthly_kpis",
    s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       |       CAST(month(o_orderdate) AS INTEGER) AS o_month,
       |       CAST(CAST(SUM($revSql) AS VARCHAR) AS DOUBLE) AS revenue,
       |       COUNT(DISTINCT o_orderkey) AS n_orders,
       |       CAST(CAST(SUM($revSql) AS VARCHAR) AS DOUBLE)
       |         / COUNT(DISTINCT o_orderkey) AS avg_order_value,
       |       CAST(CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
       |         / COUNT(*) AS avg_discount,
       |       100 * AVG(CASE
       |           WHEN o_orderstatus = 'O' THEN NULL
       |           WHEN date_diff('day', CAST(o_orderdate AS DATE),
       |                          CAST(l_shipdate AS DATE)) <= 30 THEN 1.0
       |           ELSE 0.0 END) AS on_time_rate_pct,
       |       AVG(CASE WHEN o_orderstatus <> 'O'
       |                 AND date_diff('day', CAST(o_orderdate AS DATE),
       |                               CAST(l_shipdate AS DATE)) > 30
       |           THEN CAST(date_diff('day', CAST(o_orderdate AS DATE),
       |                     CAST(l_shipdate AS DATE)) AS DOUBLE) END)
       |         AS avg_delay_if_late
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val t     = Tables(spark, dir)
    val delay = datediff(to_date($"l_shipdate"), to_date($"o_orderdate"))
    val onTime = when($"o_orderstatus" === "O", lit(null).cast(DoubleType))
      .when(delay <= 30, 1.0).otherwise(0.0)
    t.lineitem
      .join(t.orders, $"l_orderkey" === $"o_orderkey")
      .groupBy(year($"o_orderdate").as("o_year"), month($"o_orderdate").as("o_month"))
      .agg(
        Exact.dsum(revenue(t.lineitem)).as("revenue"),
        countDistinct($"o_orderkey").as("n_orders"),
        // ref 5B's avg_order_value: AVG over order-grain revenue
        // == monthly revenue / distinct orders (`TASK 2A…sql:276`)
        (Exact.dsum(revenue(t.lineitem)) / countDistinct($"o_orderkey"))
          .as("avg_order_value"),
        (Exact.toDouble(sum($"l_discount".cast(DecimalType(38, 6))))
          / count(lit(1))).as("avg_discount"),
        (avg(onTime) * 100).as("on_time_rate_pct"),
        avg(when($"o_orderstatus" =!= "O" && delay > 30, delay.cast(DoubleType)))
          .as("avg_delay_if_late"))
  }

  val all: Seq[GraftQuery] = Seq(
    q1aYoyGrowth, q1bSeasonalIndex, q2aGroupingSets, q2bRollup,
    q3aRankNtile, q3aRankNtileDist, q3bMovingAvgYtd, q3cWindowExtras,
    q4aSemiJoinChain, q4bPriceVsBrand,
    q5aTopLtv, q5bMonthlyKpis)
}
