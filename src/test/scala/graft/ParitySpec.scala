package graft

import org.apache.spark.sql.DataFrame

import graft.queries.AnalyticalQueries

/** SQL-entry parity for the FULL headline set: the reference is
  * SQL-first (`TASK 2A SQL Analytical Queries.sql`), so a reference
  * user's natural entry point is `spark.sql` over registered views.
  * Each headline query's DataFrame surface must be reproduced BITWISE
  * by a Spark-dialect ANSI SQL twin — including the exact-decimal
  * device (`CAST(CAST(SUM(DECIMAL(38,6)) AS STRING) AS DOUBLE)`,
  * [[graft.functions.Exact]]): if the SQL surface ever diverged on a
  * double, the engine would not be a drop-in SQL replacement.
  *
  * These twins are SPARK SQL (STRING casts, datediff), not the DuckDB
  * oracle dialect (VARCHAR, date_diff('day', …)) — the DuckDB gate
  * covers engine-vs-oracle; this spec covers surface-vs-surface
  * inside the one engine.
  */
class ParitySpec extends SparkTestBase {

  private val Rev =
    "CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))"

  /** Exact-decimal sum → double, the Exact.dsum device in SQL. */
  private def xd(inner: String) =
    s"CAST(CAST($inner AS STRING) AS DOUBLE)"

  private lazy val headlineSql: Seq[(String, String)] = Seq(
    "q1a_yoy_growth" ->
      s"""WITH rev AS (
         |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         |         CAST(month(o_orderdate) AS INT) AS o_month,
         |         ${xd(s"SUM($Rev)")} AS revenue
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  GROUP BY 1, 2)
         |SELECT o_year, o_month, revenue,
         |       LAG(revenue) OVER (PARTITION BY o_month ORDER BY o_year)
         |         AS prev_year_revenue,
         |       CASE WHEN LAG(revenue) OVER (PARTITION BY o_month
         |                                    ORDER BY o_year) <> 0
         |            THEN (revenue - LAG(revenue) OVER (PARTITION BY o_month
         |                                               ORDER BY o_year))
         |                 / LAG(revenue) OVER (PARTITION BY o_month
         |                                      ORDER BY o_year) * 100
         |       END AS yoy_growth_pct
         |FROM rev""".stripMargin,

    "q1b_seasonal_index" ->
      s"""WITH daily AS (
         |  SELECT to_date(o_orderdate) AS o_day,
         |         CAST(month(o_orderdate) AS INT) AS o_month,
         |         SUM($Rev) AS rev_dec
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  GROUP BY 1, 2),
         |m AS (
         |  SELECT o_month,
         |         ${xd("SUM(rev_dec)")} / COUNT(*) AS avg_rev_month
         |  FROM daily GROUP BY 1),
         |o AS (SELECT ${xd("SUM(rev_dec)")} / COUNT(*) AS avg_rev_overall
         |      FROM daily)
         |SELECT m.o_month, m.avg_rev_month, o.avg_rev_overall,
         |       CASE WHEN o.avg_rev_overall <> 0
         |            THEN m.avg_rev_month / o.avg_rev_overall END
         |         AS seasonal_index
         |FROM m CROSS JOIN o""".stripMargin,

    "q2a_grouping_sets" ->
      s"""WITH base AS (
         |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         |         CAST(month(o_orderdate) AS INT) AS o_month,
         |         c_mktsegment AS segment, o_orderkey,
         |         SUM($Rev) AS rev
         |  FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  GROUP BY 1, 2, 3, 4)
         |SELECT o_year, o_month, segment,
         |       CASE WHEN GROUPING(o_year) = 1 THEN 'GRAND TOTAL'
         |            WHEN GROUPING(o_month) = 1 THEN 'YEAR TOTAL'
         |            WHEN GROUPING(segment) = 1 THEN 'MONTH TOTAL'
         |            ELSE 'DETAIL' END AS row_type,
         |       ${xd("SUM(rev)")} AS revenue,
         |       COUNT(*) AS n_orders
         |FROM base
         |GROUP BY GROUPING SETS (
         |  (o_year, o_month, segment), (o_year, o_month), (o_year), ())"""
        .stripMargin,

    "q2b_rollup" ->
      s"""SELECT p_brand, p_partkey,
         |       CASE WHEN GROUPING(p_brand) = 1 THEN 'GRAND TOTAL'
         |            WHEN GROUPING(p_partkey) = 1 THEN 'BRAND TOTAL'
         |            ELSE 'DETAIL' END AS row_type,
         |       ${xd(s"SUM($Rev)")} AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY ROLLUP (p_brand, p_partkey)""".stripMargin,

    "q3a_rank_ntile" ->
      s"""WITH rev AS (
         |  SELECT n_name, c_custkey, ${xd(s"SUM($Rev)")} AS revenue
         |  FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |  GROUP BY 1, 2)
         |SELECT n_name, c_custkey, revenue,
         |       RANK() OVER (PARTITION BY n_name
         |         ORDER BY revenue DESC, c_custkey) AS rev_rank,
         |       NTILE(100) OVER (PARTITION BY n_name
         |         ORDER BY revenue DESC, c_custkey) AS percentile_band
         |FROM rev""".stripMargin,

    "q3b_moving_avg_ytd" ->
      s"""WITH daily AS (
         |  SELECT to_date(l_shipdate) AS ship_day, SUM($Rev) AS rev
         |  FROM lineitem GROUP BY 1)
         |SELECT CAST(ship_day AS STRING) AS ship_day,
         |       ${xd("rev")} AS revenue,
         |       ${xd(
               """SUM(rev) OVER (ORDER BY ship_day
                 |           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)"""
                 .stripMargin)}
         |         / COUNT(*) OVER (ORDER BY ship_day
         |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
         |         AS moving_avg_7d,
         |       ${xd(
               """SUM(rev) OVER (PARTITION BY year(ship_day)
                 |           ORDER BY ship_day
                 |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""
                 .stripMargin)} AS ytd_revenue
         |FROM daily""".stripMargin,

    "q4a_semi_join_chain" ->
      """WITH pr AS (
        |  SELECT l_partkey FROM (
        |    SELECT l_partkey, l_orderkey,
        |           COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS n_ret,
        |           COUNT(*) AS n_lines
        |    FROM lineitem GROUP BY 1, 2)
        |  GROUP BY 1
        |  HAVING COUNT(*) >= 3
        |     AND CAST(SUM(n_ret) AS DOUBLE) / SUM(n_lines) > 0.3),
        |building AS (
        |  SELECT DISTINCT l_partkey
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment = 'BUILDING')
        |SELECT p_partkey, p_name, p_brand FROM part
        |WHERE p_partkey IN (SELECT l_partkey FROM pr)
        |  AND p_partkey IN (SELECT l_partkey FROM building)""".stripMargin,

    "q4b_price_vs_brand" ->
      s"""WITH pp AS (
         |  SELECT p_partkey, p_brand,
         |         SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS price_dec,
         |         COUNT(*) AS n_lines
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  GROUP BY 1, 2),
         |pb AS (
         |  SELECT p_brand,
         |         ${xd("SUM(price_dec)")} / SUM(n_lines) AS avg_price_brand
         |  FROM pp GROUP BY 1)
         |SELECT pp.p_partkey, pp.p_brand,
         |       ${xd("pp.price_dec")} / pp.n_lines AS avg_price_part,
         |       pb.avg_price_brand
         |FROM pp JOIN pb ON pp.p_brand = pb.p_brand
         |WHERE ${xd("pp.price_dec")} / pp.n_lines > pb.avg_price_brand"""
        .stripMargin,

    "q5a_top_ltv" ->
      s"""WITH per_order AS (
         |  SELECT o_custkey, o_orderkey, SUM($Rev) AS rev
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  GROUP BY 1, 2)
         |SELECT c_custkey, c_name,
         |       ${xd("SUM(rev)")} AS ltv_revenue,
         |       COUNT(*) AS n_orders,
         |       ${xd("SUM(rev)")} / COUNT(*) AS avg_receipt_value
         |FROM per_order JOIN customer ON o_custkey = c_custkey
         |GROUP BY 1, 2
         |ORDER BY ltv_revenue DESC, c_custkey
         |LIMIT 20""".stripMargin,

    "q5b_monthly_kpis" ->
      s"""SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         |       CAST(month(o_orderdate) AS INT) AS o_month,
         |       ${xd(s"SUM($Rev)")} AS revenue,
         |       COUNT(DISTINCT o_orderkey) AS n_orders,
         |       ${xd(s"SUM($Rev)")} / COUNT(DISTINCT o_orderkey)
         |         AS avg_order_value,
         |       ${xd("SUM(CAST(l_discount AS DECIMAL(38,6)))")} / COUNT(*)
         |         AS avg_discount,
         |       AVG(CASE
         |           WHEN o_orderstatus = 'O' THEN CAST(NULL AS DOUBLE)
         |           WHEN datediff(to_date(l_shipdate), to_date(o_orderdate))
         |                <= 30 THEN 1.0D
         |           ELSE 0.0D END) * 100 AS on_time_rate_pct,
         |       AVG(CASE WHEN o_orderstatus <> 'O'
         |                 AND datediff(to_date(l_shipdate),
         |                              to_date(o_orderdate)) > 30
         |           THEN CAST(datediff(to_date(l_shipdate),
         |                              to_date(o_orderdate)) AS DOUBLE) END)
         |         AS avg_delay_if_late
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY 1, 2""".stripMargin)

  private def registerViews(): Unit = {
    val t = Tables(spark, sfDir)
    t.lineitem.createOrReplaceTempView("lineitem")
    t.orders.createOrReplaceTempView("orders")
    t.customer.createOrReplaceTempView("customer")
    t.part.createOrReplaceTempView("part")
    t.nation.createOrReplaceTempView("nation")
  }

  private def headlineDf(name: String): DataFrame =
    AnalyticalQueries.all.find(_.name == name)
      .getOrElse(fail(s"$name missing from AnalyticalQueries.all"))
      .fn(spark, sfDir)

  test("spark.sql over registered views equals the DataFrame surface " +
    "bitwise for all ten headline queries") {
    registerViews()
    headlineSql.foreach { case (name, sql) =>
      val viaSql = spark.sql(sql)
      val viaDf = headlineDf(name)
      assert(viaSql.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        viaDf.schema.fields.map(f => (f.name, f.dataType)).toSeq,
        s"$name: SQL/DataFrame schemas differ:\n" +
          s" sql=${viaSql.schema.treeString}\n df=${viaDf.schema.treeString}")
      assert(viaSql.count() > 0, s"$name: SQL twin returned no rows")
      // exceptAll both ways = exact multiset equality, bitwise doubles
      val extra = viaSql.exceptAll(viaDf).count()
      val missing = viaDf.exceptAll(viaSql).count()
      assert(extra == 0 && missing == 0,
        s"$name: SQL and DataFrame surfaces diverge " +
          s"(sql-only=$extra, df-only=$missing)")
    }
  }

  test("the parity set IS the headline set (no silent drift)") {
    val headline = Seq("q1a_yoy_growth", "q1b_seasonal_index",
      "q2a_grouping_sets", "q2b_rollup", "q3a_rank_ntile",
      "q3b_moving_avg_ytd", "q4a_semi_join_chain", "q4b_price_vs_brand",
      "q5a_top_ltv", "q5b_monthly_kpis")
    assert(headlineSql.map(_._1) == headline)
    headline.foreach { n =>
      assert(AnalyticalQueries.all.exists(_.name == n), s"$n unregistered")
    }
  }
}
