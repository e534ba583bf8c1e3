package graft.analytics

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Exact
import graft.queries.GraftQuery
import graft.Staging.Stageable

/** The reference's Power BI DAX measures (Final Report §7.1, SURVEY
  * §2.5 W7): rolling-window distinct actives, month-over-month churned
  * customers via EXCEPT/anti-join, and the what-if parameter table.
  *
  * Rolling distinct-count is NOT a Spark window function
  * (countDistinct over a frame is unsupported) — the scalable
  * re-expression is the offset-explode: each (customer, month)
  * activity row is emitted into the k months whose trailing window
  * contains it (cross join with a k-row offsets table), then a plain
  * hash-agg countDistinct per target month. Pure equi-joins, no
  * nested-loop range join, linear in activity × k at any scale.
  */
object DaxMeasures {

  private def monthIdxSql(c: String) =
    s"(year($c) * 12 + month($c) - 1)"

  /** q10a — rolling 3-month distinct active customers per month. */
  val q10aRollingActive: GraftQuery = GraftQuery(
    "q10a_rolling_active",
    s"""WITH activity AS (
       |  SELECT DISTINCT o_custkey,
       |         ${monthIdxSql("o_orderdate")} AS m
       |  FROM orders),
       |months AS (SELECT DISTINCT m FROM activity),
       |expanded AS (
       |  SELECT a.o_custkey, a.m + o.off AS tm
       |  FROM activity a CROSS JOIN (VALUES (0), (1), (2)) o(off))
       |SELECT CAST(tm // 12 AS INTEGER) AS o_year,
       |       CAST(tm % 12 + 1 AS INTEGER) AS o_month,
       |       COUNT(DISTINCT o_custkey) AS active_3mo
       |FROM expanded JOIN months ON tm = months.m
       |GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val t = Tables(spark, dir)
    val monthIdx = (year($"o_orderdate") * 12 + month($"o_orderdate") - 1)
    val activity = t.orders
      .select($"o_custkey", monthIdx.as("m")).distinct()
    val months = activity.select($"m").distinct()
    val offsets = Seq(0, 1, 2).toDF("off")
    activity
      .crossJoin(broadcast(offsets))
      .select($"o_custkey", ($"m" + $"off").as("tm"))
      .join(broadcast(months), $"tm" === months("m"), "left_semi")
      .groupBy(($"tm" / 12).cast("int").as("o_year"),
        (pmod($"tm", lit(12)) + 1).cast("int").as("o_month"))
      .agg(countDistinct($"o_custkey").as("active_3mo"))
  }

  /** q10b — churned customers per month: active in m−1, absent in m
    * (DAX EXCEPT(prev, current) → left_anti join).
    */
  val q10bChurned: GraftQuery = GraftQuery(
    "q10b_churned_customers",
    s"""WITH activity AS (
       |  SELECT DISTINCT o_custkey,
       |         ${monthIdxSql("o_orderdate")} AS m
       |  FROM orders),
       |months AS (SELECT DISTINCT m FROM activity)
       |SELECT CAST((a.m + 1) // 12 AS INTEGER) AS o_year,
       |       CAST((a.m + 1) % 12 + 1 AS INTEGER) AS o_month,
       |       COUNT(*) AS churned_customers
       |FROM activity a
       |JOIN months nm ON nm.m = a.m + 1
       |LEFT JOIN activity b ON b.o_custkey = a.o_custkey AND b.m = a.m + 1
       |WHERE b.o_custkey IS NULL
       |GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val t = Tables(spark, dir)
    val monthIdx = (year($"o_orderdate") * 12 + month($"o_orderdate") - 1)
    // Three consumers (months, next-month probe, anti-join right side)
    // read the distinct (custkey, month) activity set. Eager
    // localCheckpoint materializes it ONCE without registering a
    // session-lifetime CacheManager entry (member-scale state, but
    // the same lifetime rule as q13b's postings — CacheSpec pins it);
    // blocks are reclaimed when the plan goes unreachable.
    val activity = t.orders
      .select($"o_custkey", monthIdx.as("m")).distinct()
      .staged
    val months = activity.select($"m").distinct()
    val next = activity.select($"o_custkey", ($"m" + 1).as("nm"))
      .join(broadcast(months), $"nm" === months("m"), "left_semi")
    val churned = next.join(
      activity.select($"o_custkey".as("bc"), $"m".as("bm")),
      $"o_custkey" === $"bc" && $"nm" === $"bm", "left_anti")
    churned
      .groupBy(($"nm" / 12).cast("int").as("o_year"),
        (pmod($"nm", lit(12)) + 1).cast("int").as("o_month"))
      .agg(count(lit(1)).as("churned_customers"))
  }

  /** q10c — what-if discount scenarios (DAX what-if parameter,
    * report §7.1): yearly revenue under discount multipliers.
    *
    * Scenario revenue is LINEAR in the multiplier:
    * Σ p·(1−d·mult) = Σp − mult·Σ(p·d), so ONE fact pass computes the
    * two decimal sums per year and the 3-row scenario table joins the
    * tiny aggregate — no 3× fact expand/shuffle. The combination stays
    * in decimal (mult is an exact 1dp decimal; p is 2dp and p·d is
    * 4dp, both inside scale 6), so the string-path double conversion
    * is bit-identical to the oracle's per-row-expanded sum.
    */
  val q10cWhatIf: GraftQuery = GraftQuery(
    "q10c_whatif_discount",
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |       s.mult AS discount_mult,
      |       CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount * s.mult)
      |            AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS scenario_revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |CROSS JOIN (VALUES (0.5), (1.0), (1.5)) s(mult)
      |GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    val t = Tables(spark, dir)
    val scenarios = Seq(0.5, 1.0, 1.5).toDF("discount_mult")
    val dec = DecimalType(38, graft.functions.Exact.Scale)
    val sums = t.lineitem
      .join(t.orders, $"l_orderkey" === $"o_orderkey")
      .groupBy(year($"o_orderdate").as("o_year"))
      .agg(sum($"l_extendedprice".cast(dec)).as("sum_p"),
        sum(($"l_extendedprice" * $"l_discount").cast(dec)).as("sum_pd"))
    sums.crossJoin(broadcast(scenarios))
      .select($"o_year", $"discount_mult",
        Exact.toDouble(
          $"sum_p" - $"discount_mult".cast(DecimalType(2, 1)) * $"sum_pd")
          .as("scenario_revenue"))
  }

  /** q11 — set operations over yearly active-customer sets
    * (SURVEY §2.7: EXISTS-intersection, DAX EXCEPT, DISTINCT, UNION).
    */
  val q11SetOps: GraftQuery = GraftQuery(
    "q11_set_ops",
    """WITH y95 AS (SELECT DISTINCT o_custkey FROM orders
      |            WHERE year(o_orderdate) = 1995),
      |y96 AS (SELECT DISTINCT o_custkey FROM orders
      |        WHERE year(o_orderdate) = 1996)
      |SELECT 'intersect_95_96' AS set_op, COUNT(*) AS n FROM
      |  (SELECT o_custkey FROM y95 INTERSECT SELECT o_custkey FROM y96)
      |UNION ALL
      |SELECT 'union_95_96', COUNT(*) FROM
      |  (SELECT o_custkey FROM y95 UNION SELECT o_custkey FROM y96)
      |UNION ALL
      |SELECT 'except_95_96', COUNT(*) FROM
      |  (SELECT o_custkey FROM y95 EXCEPT SELECT o_custkey FROM y96)""".stripMargin) {
    (spark, dir) =>
      import spark.implicits._
      val t = Tables(spark, dir)
      def active(y: Int) = t.orders
        .filter(year($"o_orderdate") === y).select($"o_custkey").distinct()
      val (a, b) = (active(1995), active(1996))
      def one(name: String, df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)).as("n")).select(lit(name).as("set_op"), $"n")
      one("intersect_95_96", a.intersect(b))
        .unionByName(one("union_95_96", a.union(b).distinct()))
        .unionByName(one("except_95_96", a.except(b)))
  }

  /** q10d — KPI vs target flags (Power BI KPI visuals, report §7.1:
    * monthly revenue / order-count targets with met/missed states).
    * Targets are the overall monthly averages (scale-free analog of
    * the reference's fixed R$850k / 7,000-order targets).
    */
  val q10dKpiTargets: GraftQuery = GraftQuery(
    "q10d_kpi_targets",
    """WITH monthly AS (
      |  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |         CAST(month(o_orderdate) AS INTEGER) AS o_month,
      |         CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
      |              AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS revenue,
      |         COUNT(DISTINCT o_orderkey) AS n_orders
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1, 2),
      |targets AS (
      |  SELECT CAST(CAST(SUM(CAST(revenue AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
      |           / COUNT(*) AS revenue_target,
      |         CAST(CAST(SUM(CAST(n_orders AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE)
      |           / COUNT(*) AS orders_target
      |  FROM monthly)
      |SELECT o_year, o_month, revenue, n_orders,
      |       t.revenue_target, t.orders_target,
      |       revenue >= t.revenue_target AS revenue_target_met,
      |       n_orders >= t.orders_target AS orders_target_met
      |FROM monthly CROSS JOIN targets t""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val t = Tables(spark, dir)
    val monthly = t.lineitem
      .join(t.orders, $"l_orderkey" === $"o_orderkey")
      .groupBy(year($"o_orderdate").as("o_year"),
        month($"o_orderdate").as("o_month"))
      .agg(Exact.dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"))
        .as("revenue"),
        countDistinct($"o_orderkey").as("n_orders"))
    val targets = monthly.agg(
      (Exact.dsum($"revenue") / count(lit(1))).as("revenue_target"),
      (Exact.dsum($"n_orders", 0) / count(lit(1))).as("orders_target"))
    monthly.crossJoin(broadcast(targets))
      .withColumn("revenue_target_met", $"revenue" >= $"revenue_target")
      .withColumn("orders_target_met", $"n_orders" >= $"orders_target")
  }

  val all: Seq[GraftQuery] =
    Seq(q10aRollingActive, q10bChurned, q10cWhatIf, q10dKpiTargets, q11SetOps)
}
