package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.Exact
import graft.queries.GraftQuery
import graft.Staging.Stageable

/** The reference's Python analytics layer (`Python Analytics/
  * PythonAnalysis.py`, SURVEY §2.4 A9–A15, §2.8 F7–F8, §2.9 M5/M7)
  * re-expressed as distributed DataFrame plans — pandas driver-memory
  * materialization becomes groupBy/window over the fact tables, so
  * every query here stays a map+shuffle pipeline at 100 TB.
  *
  * Cross-engine determinism: every sum/mean/std/corr goes through
  * [[Exact]] (decimal-accumulated, order-free); full-precision derived
  * doubles (distances, logs) are snapped to DECIMAL(38,6/9) before
  * aggregation so the accumulation is associative. libm calls
  * (sin/cos/asin/ln) are per-row and deterministic on a given host.
  */
object AnalyticsQueries {

  private val revSql =
    "CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))"

  /** q9a — describe(): count/mean/std/min/p25/median/p75/max per
    * measure (ref `PythonAnalysis.py:162-181`, A10). One row per
    * measure via union of aggregates (a tiny static unpivot).
    */
  val q9aDescriptiveStats: GraftQuery = {
    def duckMeasure(m: String): String =
      s"""SELECT '$m' AS measure, COUNT($m) AS n,
         |  CAST(CAST(SUM(CAST($m AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
         |    / COUNT($m) AS mean,
         |  CASE WHEN COUNT($m) >= 2 THEN
         |  sqrt(GREATEST(0, COUNT($m) * CAST(CAST(SUM(CAST($m*$m AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE)
         |        - CAST(CAST(SUM(CAST($m AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
         |          * CAST(CAST(SUM(CAST($m AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE))
         |       / (COUNT($m) * (COUNT($m) - 1.0))) END AS std,
         |  MIN($m) AS min_v,
         |  quantile_cont($m, 0.25) AS p25,
         |  quantile_cont($m, 0.5) AS median,
         |  quantile_cont($m, 0.75) AS p75,
         |  MAX($m) AS max_v
         |FROM lineitem""".stripMargin
    val measures = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    GraftQuery(
      "q9a_descriptive_stats",
      measures.map(duckMeasure).mkString("\nUNION ALL\n")) { (spark, dir) =>
      import spark.implicits._
      // fanOut (r17): the per-measure aggregations carry heavy per-row
      // state (exact percentile buffers / GK sketch updates + decimal
      // moments) and ran entirely inside the single-row-group scan
      // task — the q9b single-task pathology. No-op at 100 TB.
      val li = graft.Tables.fanOut(Tables(spark, dir).lineitem)
      def one(m: String): DataFrame = {
        val c = col(m)
        li.agg(
          count(c).as("n"),
          Exact.davg(c).as("mean"),
          Exact.dstddev(c).as("std"),
          min(c).as("min_v"),
          percentile(c, lit(0.25)).as("p25"),
          percentile(c, lit(0.5)).as("median"),
          percentile(c, lit(0.75)).as("p75"),
          max(c).as("max_v"))
          .select(lit(m).as("measure"), $"n", $"mean", $"std",
            $"min_v", $"p25", $"median", $"p75", $"max_v")
      }
      measures.map(one).reduce(_ unionByName _)
    }
  }

  /** q9a scale path — exact `percentile` is a TypedImperativeAggregate
    * that buffers EVERY value in one aggregation buffer: OOM at 100 TB.
    * This twin swaps in `percentile_approx` (Greenwald-Khanna sketch:
    * bounded memory, map-side combine, rank error ≤ n/accuracy) —
    * same baseline/scale-path pairing as q13e/q14b.
    *
    * ORACLE-GATED via a tolerance invariant: sketch values are
    * engine-specific, so instead of hashing them the query verifies
    * each one against the sketch's own rank guarantee — the exact
    * rank interval of the returned value, [count(< x), count(≤ x)]
    * (tie-safe), must intersect q·n ± n/1000 (10× the configured
    * accuracy=10000 bound). The output row carries the EXACT
    * count/mean/std/min/max plus one boolean per quantile; the DuckDB
    * twin emits the exact stats and `true` literals, so the hash gate
    * fails if any sketch ever leaves its guarantee. ApproxSpec still
    * pins value-level error against the exact twin.
    */
  val q9aApproxDescriptiveStats: GraftQuery = {
    val measures = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    def duckMeasure(m: String): String =
      s"""SELECT '$m' AS measure, COUNT($m) AS n,
         |  CAST(CAST(SUM(CAST($m AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
         |    / COUNT($m) AS mean,
         |  CASE WHEN COUNT($m) >= 2 THEN
         |  sqrt(GREATEST(0, COUNT($m) * CAST(CAST(SUM(CAST($m*$m AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE)
         |        - CAST(CAST(SUM(CAST($m AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
         |          * CAST(CAST(SUM(CAST($m AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE))
         |       / (COUNT($m) * (COUNT($m) - 1.0))) END AS std,
         |  MIN($m) AS min_v, MAX($m) AS max_v,
         |  true AS p25_ok, true AS median_ok, true AS p75_ok
         |FROM lineitem""".stripMargin
    GraftQuery(
      "q9a_descriptive_stats_approx",
      measures.map(duckMeasure).mkString("\nUNION ALL\n")) { (spark, dir) =>
      import spark.implicits._
      // fanOut (r17): the per-measure aggregations carry heavy per-row
      // state (exact percentile buffers / GK sketch updates + decimal
      // moments) and ran entirely inside the single-row-group scan
      // task — the q9b single-task pathology. No-op at 100 TB.
      val li = graft.Tables.fanOut(Tables(spark, dir).lineitem)
      // ONE sketch pass for ALL FOUR measures (r17; previously one
      // eagerly-checkpointed pass per measure, i.e. 4 sequential scan
      // + sketch jobs, then 4 more rank passes — 8 passes total). The
      // 1-row all-measures sketch is consumed TWICE (ranks' broadcast
      // and ranked's left side) — eager localCheckpoint so the
      // percentile_approx scan runs ONCE, not per consumer (Spark
      // does not reuse the exchange between a broadcast and a
      // non-broadcast occurrence of the same subtree; the q9b
      // one-row-moment device, chosen over .cache() for CacheSpec's
      // no-session-lifetime-entries invariant).
      val sketchAggs = measures.flatMap { m =>
        val c = col(m)
        Seq(
          count(c).as(s"n_$m"),
          Exact.davg(c).as(s"mean_$m"),
          Exact.dstddev(c).as(s"std_$m"),
          min(c).as(s"min_$m"),
          max(c).as(s"max_$m"),
          percentile_approx(c, lit(0.25), lit(10000)).as(s"p25a_$m"),
          percentile_approx(c, lit(0.5), lit(10000)).as(s"p50a_$m"),
          percentile_approx(c, lit(0.75), lit(10000)).as(s"p75a_$m"))
      }
      val sketch = li.agg(sketchAggs.head, sketchAggs.tail: _*)
        .staged
      // second linear pass — also fused across measures: exact rank
      // interval of each sketch value (strictly-below and at-most
      // counts — the interval a value with ties occupies), verified
      // against q·n ± err. The rank sums ride their own 1-row
      // aggregate joined back to the sketch row (not a first()-
      // re-aggregation of the crossJoin): an EMPTY feed empties the
      // crossJoin, which would NULL the re-aggregated stats (n must
      // read 0, not NULL) — the rank sums instead coalesce to 0 and
      // the verdicts hold vacuously, matching the twin's n=0/true row
      // (degenerate-dir twin audit, SURVEY §8.9).
      def rsum(cond: Column, name: String) =
        coalesce(sum(when(cond, 1L).otherwise(0L)), lit(0L)).as(name)
      val rankAggs = measures.flatMap { m =>
        val c = col(m)
        Seq(
          rsum(c < col(s"p25a_$m"), s"b25_$m"),
          rsum(c <= col(s"p25a_$m"), s"a25_$m"),
          rsum(c < col(s"p50a_$m"), s"b50_$m"),
          rsum(c <= col(s"p50a_$m"), s"a50_$m"),
          rsum(c < col(s"p75a_$m"), s"b75_$m"),
          rsum(c <= col(s"p75a_$m"), s"a75_$m"))
      }
      val ranks = li.crossJoin(broadcast(sketch))
        .agg(rankAggs.head, rankAggs.tail: _*)
      val ranked = sketch.crossJoin(broadcast(ranks))
      def one(m: String): DataFrame = {
        val err = greatest(lit(1.0), col(s"n_$m") / 1000.0)
        def ok(q: Double, below: String, atMost: String) =
          (col(below) <= lit(q) * col(s"n_$m") + err) &&
            (col(atMost) >= lit(q) * col(s"n_$m") - err)
        ranked.select(lit(m).as("measure"), col(s"n_$m").as("n"),
          col(s"mean_$m").as("mean"), col(s"std_$m").as("std"),
          col(s"min_$m").as("min_v"), col(s"max_$m").as("max_v"),
          ok(0.25, s"b25_$m", s"a25_$m").as("p25_ok"),
          ok(0.50, s"b50_$m", s"a50_$m").as("median_ok"),
          ok(0.75, s"b75_$m", s"a75_$m").as("p75_ok"))
      }
      measures.map(one).reduce(_ unionByName _)
    }
  }

  /** q9b — the FULL measures-vs-outcomes correlation matrix
    * (ref `PythonAnalysis.py:172-177`, A11: the reference correlates
    * its 10 measures against on_time/delay — same 10×2 grid here)
    * from exact decimal moments. delay_days = ship − order date;
    * on_time = delay ≤ 30 as 0/1. Measures are raw ≤2dp columns ONLY:
    * derived doubles (revenue = price·(1−disc), 4dp) would square to
    * 8dp products, outside the decimal-snap exactness envelope Exact
    * documents — the grid stays bitwise-reproducible by construction.
    */
  val q9bCorrelations: GraftQuery = {
    val measures = Seq("l_quantity", "l_extendedprice", "l_discount",
      "l_tax", "l_linenumber", "o_totalprice", "p_retailprice", "p_size",
      "c_acctbal", "s_acctbal")
    val outcomes = Seq("delay_days", "on_time")
    val pairs = for { m <- measures; o <- outcomes } yield (m, o)
    // o_totalprice reaches ~5e5, so its square ×10⁴ (~2.5e15) sits in
    // the zone where DuckDB's multiply-then-round double→decimal cast
    // can disagree with Spark's string-path cast (error bound 2⁻⁵²·x
    // crosses 0.5 ulp of the decimal). Pearson corr is shift-invariant,
    // so the measure enters BOTH engines centered (x − 250 000): still
    // an exact 2dp value, squares ≤ 6.25e14·10⁻⁴ — safely inside the
    // envelope Exact documents. The pair label keeps the raw name.
    val baseSql =
      """SELECT l_quantity, l_extendedprice, l_discount, l_tax,
        |       l_linenumber,
        |       o_totalprice - 250000.0 AS o_totalprice,
        |       p_retailprice, p_size,
        |       c_acctbal, s_acctbal,
        |       CAST(date_diff('day', CAST(o_orderdate AS DATE),
        |                      CAST(l_shipdate AS DATE)) AS DOUBLE) AS delay_days,
        |       CAST(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
        |                      CAST(l_shipdate AS DATE)) <= 30
        |            THEN 1.0 ELSE 0.0 END AS DOUBLE) AS on_time
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN part ON l_partkey = p_partkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey""".stripMargin
    // correlation is undefined when either side has zero variance —
    // CASE-guard BOTH variance terms to NULL on BOTH engines: a
    // constant measure (dirty ingest default, e.g. tax ≡ 0) makes the
    // denominator an exact double 0, and the raw 0/0 THROWS under
    // ANSI on Spark while DuckDB answers NaN (the dstddev class —
    // degenerate-dir twin audit, SURVEY §8.9; the guard also absorbs
    // the tiny-NEGATIVE pure-rounding variance, where sqrt goes NaN
    // vs THROW). Variance exprs are exact-moment-derived, so the
    // guard decision is engine-identical.
    def duckVar(x: String): String =
      s"""(COUNT(*) * CAST(CAST(SUM(CAST($x*$x AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE)
         |   - CAST(CAST(SUM(CAST($x AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
         |     * CAST(CAST(SUM(CAST($x AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE))""".stripMargin
    def duckPair(x: String, y: String): String =
      s"""SELECT '${x}_vs_$y' AS pair, COUNT(*) AS n,
         |  CASE WHEN ${duckVar(x)} > 0 AND ${duckVar(y)} > 0 THEN
         |  (COUNT(*) * CAST(CAST(SUM(CAST($x*$y AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE)
         |   - CAST(CAST(SUM(CAST($x AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
         |     * CAST(CAST(SUM(CAST($y AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE))
         |  / (sqrt(${duckVar(x)}) * sqrt(${duckVar(y)})) END
         |    AS corr FROM base""".stripMargin
    GraftQuery(
      "q9b_correlations",
      s"WITH base AS ($baseSql)\n" +
        pairs.map { case (x, y) => duckPair(x, y) }.mkString("\nUNION ALL\n")) {
      (spark, dir) =>
        import spark.implicits._
        val t = Tables(spark, dir)
        val delay = datediff(to_date($"l_shipdate"), to_date($"o_orderdate"))
        // part/customer/supplier are the LARGEST dims — no broadcast
        // hint (at 100 TB they exceed the 8 GB broadcast cap; a hint
        // would be a hard driver failure). AQE picks broadcast when a
        // side is genuinely small, shuffle/sort-merge otherwise.
        // Fan the fact scan out (r17): unlike the headline queries'
        // filter→partial-agg shapes (where the Tables doc's measured
        // +0.5 s/query anti-fan-out rule holds), this query runs FOUR
        // broadcast probes plus ~45 decimal-sum updates per row — at
        // a single-row-group local scan that whole pipeline sat in
        // ONE task (11.9 s single-threaded, r17 full-registry pass).
        // Fanning spreads the per-row CPU across the session's cores;
        // at 100 TB the scan is already ≥cores partitions and fanOut
        // is a no-op by construction.
        val base = graft.Tables.fanOut(t.lineitem)
          .join(t.orders, $"l_orderkey" === $"o_orderkey")
          .join(t.part, $"l_partkey" === $"p_partkey")
          .join(t.customer, $"o_custkey" === $"c_custkey")
          .join(t.supplier, $"l_suppkey" === $"s_suppkey")
          .select($"l_quantity", $"l_extendedprice", $"l_discount", $"l_tax",
            $"l_linenumber",
            ($"o_totalprice" - 250000.0).as("o_totalprice"),
            $"p_retailprice", $"p_size",
            $"c_acctbal", $"s_acctbal",
            delay.cast(DoubleType).as("delay_days"),
            when(delay <= 30, 1.0).otherwise(0.0).as("on_time"))
        // ONE pass computes every moment the 20-cell grid needs (a
        // per-pair agg would rescan the fact 20× at 100 TB; caching a
        // 100 TB projection is not a plan). The 20 corr rows then
        // derive from the ONE-ROW moment table — materialized with an
        // eager localCheckpoint rather than .cache() so even this
        // trivial frame leaves no session-lifetime CacheManager entry
        // (CacheSpec's no-new-entries invariant is global).
        val aggs =
          Seq(count(lit(1)).as("n")) ++
            (measures ++ outcomes).flatMap(c => Seq(
              Exact.dsum(col(c)).as(s"sx_$c"),
              Exact.dsum(col(c) * col(c), 4).as(s"sxx_$c"))) ++
            pairs.map { case (x, y) =>
              Exact.dsum(col(x) * col(y), 4).as(s"sxy_${x}_$y") }
        val m = base.agg(aggs.head, aggs.tail: _*).staged
        pairs.map { case (x, y) =>
          val n = $"n".cast(DoubleType)
          // zero-variance guard, twin of duckPair's CASE (see the
          // oracle-side comment): constant measure → NULL, not a
          // Spark-throws-DuckDB-NaN divergence
          val vx = n * col(s"sxx_$x") - col(s"sx_$x") * col(s"sx_$x")
          val vy = n * col(s"sxx_$y") - col(s"sx_$y") * col(s"sx_$y")
          m.select(lit(s"${x}_vs_$y").as("pair"), $"n",
            when(vx > 0 && vy > 0,
              (n * col(s"sxy_${x}_$y") - col(s"sx_$x") * col(s"sx_$y"))
                / (sqrt(vx) * sqrt(vy)))
              .as("corr"))
        }.reduce(_ unionByName _)
    }
  }

  /** q9c — binned aggregation: fixed price bands → group stats
    * (ref `pd.cut` `PythonAnalysis.py:332-343, 388-398`, A12).
    */
  val q9cBinnedAgg: GraftQuery = GraftQuery(
    "q9c_binned_agg",
    s"""SELECT CAST(floor(l_extendedprice / 10000) AS BIGINT) AS price_band,
       |       COUNT(*) AS n_lines,
       |       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
       |         / COUNT(*) AS avg_price,
       |       CAST(CAST(SUM($revSql) AS VARCHAR) AS DOUBLE) AS revenue,
       |       CAST(CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
       |         / COUNT(*) AS avg_discount
       |FROM lineitem GROUP BY 1""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val li = Tables(spark, dir).lineitem
    li.groupBy(floor($"l_extendedprice" / 10000).as("price_band"))
      .agg(count(lit(1)).as("n_lines"),
        Exact.davg($"l_extendedprice").as("avg_price"),
        Exact.dsum(Exact.revenueExpr($"l_extendedprice", $"l_discount"))
          .as("revenue"),
        Exact.davg($"l_discount").as("avg_discount"))
  }

  /** Per-customer (spend, n_orders) — shared input of the q9d twins. */
  private def custSpendOrders(spark: org.apache.spark.sql.SparkSession,
                              dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    t.lineitem
      .join(t.orders, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_custkey")
      .agg(Exact.dsum(Exact.revenueExpr($"l_extendedprice", $"l_discount"))
        .as("spend"),
        countDistinct($"o_orderkey").as("n_orders"))
  }

  /** q9d — value×frequency tertile segmentation + prescriptive action
    * matrix (ref `pd.qcut` `PythonAnalysis.py:459-468` A13 + 3×3
    * action rules `:480-504` M7). ntile over a total order — the
    * oracle-checked exactness baseline; q9d_segmentation_approx is
    * the scale path (the global ntile windows funnel every customer
    * through ONE task's sort).
    */
  val q9dSegmentation: GraftQuery = GraftQuery(
    "q9d_segmentation",
    s"""WITH cust AS (
       |  SELECT o_custkey,
       |         CAST(CAST(SUM($revSql) AS VARCHAR) AS DOUBLE) AS spend,
       |         COUNT(DISTINCT o_orderkey) AS n_orders
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  GROUP BY 1),
       |seg AS (
       |  SELECT o_custkey, spend, n_orders,
       |         CAST(NTILE(3) OVER (ORDER BY spend DESC, o_custkey) AS INTEGER)
       |           AS value_tertile,
       |         CAST(NTILE(3) OVER (ORDER BY n_orders DESC, o_custkey) AS INTEGER)
       |           AS freq_tertile
       |  FROM cust)
       |SELECT value_tertile, freq_tertile, COUNT(*) AS n_customers,
       |       CAST(CAST(SUM(CAST(spend AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
       |         / COUNT(*) AS avg_spend,
       |       CASE WHEN value_tertile = 1 AND freq_tertile = 1 THEN 'reward_vip'
       |            WHEN value_tertile = 1 THEN 'increase_frequency'
       |            WHEN freq_tertile = 1 THEN 'upsell_value'
       |            WHEN value_tertile = 3 AND freq_tertile = 3 THEN 'reactivate_or_drop'
       |            ELSE 'nurture' END AS action
       |FROM seg GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val seg = custSpendOrders(spark, dir)
      .withColumn("value_tertile",
        ntile(3).over(Window.orderBy($"spend".desc, $"o_custkey")))
      .withColumn("freq_tertile",
        ntile(3).over(Window.orderBy($"n_orders".desc, $"o_custkey")))
    seg.groupBy($"value_tertile", $"freq_tertile")
      .agg(count(lit(1)).as("n_customers"),
        Exact.davg($"spend").as("avg_spend"))
      // label after the agg — pure function of the grouping keys; a
      // first(CASE..string) inside would force SortAggregate (string
      // buffers are not hash-mutable), same fix as the q9d_approx twin
      .withColumn("action",
        when($"value_tertile" === 1 && $"freq_tertile" === 1, "reward_vip")
          .when($"value_tertile" === 1, "increase_frequency")
          .when($"freq_tertile" === 1, "upsell_value")
          .when($"value_tertile" === 3 && $"freq_tertile" === 3,
            "reactivate_or_drop")
          .otherwise("nurture"))
  }

  /** q9d scale path — segmentation without the global sort: tertile
    * CUTPOINTS come from one `percentile_approx` aggregate (GK sketch,
    * map+combine, no single-task window), then bucketing is a map-only
    * `when()` chain against 4 broadcast doubles. Semantics shift from
    * ntile's balanced-count tiles to threshold tiles (ties share a
    * tile — the behavior you actually want for segments); sketch-based
    * → rows-only gate, ApproxSpec pins cutpoint error vs the exact
    * twin and asserts the plan is Window-free.
    * Ref semantics preserved: `PythonAnalysis.py:459-468, 480-504`.
    */
  /** q9d_approx body over EXPLICIT cutpoints, factored so the verdict
    * spec can feed deliberately-wrong cuts and pin that the appended
    * `cuts_in_rank_band` verdict FLIPS. The verdict is the q9a_approx
    * rank-guarantee device emitted as data for the driver's rows-only
    * gate: a second linear pass counts each cut's strictly-below /
    * at-most ranks and checks them against q·n ± max(1, n/10000) (the
    * GK sketch's contract at accuracy 10000 — ties widen a value's
    * rank INTERVAL, which is exactly what the two-sided count pair
    * measures). Empty feed → coalesced 0-counts → vacuously true,
    * matching the exact twin's empty output.
    */
  private[graft] def approxSegmentationFrom(
      cust: DataFrame, cuts: DataFrame): DataFrame = {
    import cust.sparkSession.implicits._
    def rsum(cond: Column, name: String) =
      coalesce(sum(when(cond, 1L).otherwise(0L)), lit(0L)).as(name)
    val ranks = cust.crossJoin(broadcast(cuts)).agg(
      count(lit(1)).as("nC"),
      rsum($"spend" < $"spend_hi", "b_shi"), rsum($"spend" <= $"spend_hi", "a_shi"),
      rsum($"spend" < $"spend_lo", "b_slo"), rsum($"spend" <= $"spend_lo", "a_slo"),
      rsum($"n_orders" < $"ord_hi", "b_ohi"), rsum($"n_orders" <= $"ord_hi", "a_ohi"),
      rsum($"n_orders" < $"ord_lo", "b_olo"), rsum($"n_orders" <= $"ord_lo", "a_olo"))
    val err = greatest(lit(1.0), $"nC" / 10000.0)
    def ok(q: Double, below: String, atMost: String) =
      (col(below) <= lit(q) * $"nC" + err) &&
        (col(atMost) >= lit(q) * $"nC" - err)
    val verdict = ranks.select(
      (ok(2.0 / 3, "b_shi", "a_shi") && ok(1.0 / 3, "b_slo", "a_slo") &&
        ok(2.0 / 3, "b_ohi", "a_ohi") && ok(1.0 / 3, "b_olo", "a_olo"))
        .as("cuts_in_rank_band"))
    val seg = cust.crossJoin(broadcast(cuts))
      .withColumn("value_tertile",
        when($"spend" > $"spend_hi", 1)
          .when($"spend" > $"spend_lo", 2).otherwise(3))
      .withColumn("freq_tertile",
        when($"n_orders" > $"ord_hi", 1)
          .when($"n_orders" > $"ord_lo", 2).otherwise(3))
    seg.groupBy($"value_tertile", $"freq_tertile")
      .agg(count(lit(1)).as("n_customers"),
        Exact.davg($"spend").as("avg_spend"))
      // the action label is a pure function of the two GROUPING keys,
      // so it is computed after the aggregate: a first(CASE..string)
      // inside the agg would force SortAggregate (string buffers are
      // not hash-mutable) over the customer-grain input — PlanAudit's
      // sort-over-fan-out axis caught exactly that
      .withColumn("action",
        when($"value_tertile" === 1 && $"freq_tertile" === 1, "reward_vip")
          .when($"value_tertile" === 1, "increase_frequency")
          .when($"freq_tertile" === 1, "upsell_value")
          .when($"value_tertile" === 3 && $"freq_tertile" === 3,
            "reactivate_or_drop")
          .otherwise("nurture"))
      .crossJoin(broadcast(verdict))
  }

  val q9dApproxSegmentation: GraftQuery = GraftQuery.noOracle(
    "q9d_segmentation_approx") { (spark, dir) =>
    import spark.implicits._
    // THREE consumers read the customer-grain frame (sketch cuts, the
    // rank-verdict counts, the bucketing pass), and each recompute is
    // a full lineitem scan + shuffle — eager localCheckpoint pins ONE
    // scan (customer grain ≪ lineitem, the node-grain-checkpoint rule;
    // the q9a_approx single-scan device applied a level lower).
    val cust = custSpendOrders(spark, dir).staged
    // descending tertiles: tile 1 = top third → thresholds at the
    // ascending 2/3 and 1/3 quantiles. The cuts frame likewise feeds
    // TWO plan consumers — checkpointed so the sketch runs once.
    val cuts = cust.agg(
      percentile_approx($"spend", lit(2.0 / 3), lit(10000)).as("spend_hi"),
      percentile_approx($"spend", lit(1.0 / 3), lit(10000)).as("spend_lo"),
      percentile_approx($"n_orders", lit(2.0 / 3), lit(10000)).as("ord_hi"),
      percentile_approx($"n_orders", lit(1.0 / 3), lit(10000)).as("ord_lo"))
      .staged
    approxSegmentationFrom(cust, cuts)
  }

  /** q9e — churn feature table + 90-day label (ref churn features
    * `PythonAnalysis.py:249-275`, A9/A14): per-customer aggregates,
    * tenure from min/max order date, days-since vs the dataset max
    * date (broadcast scalar), fillna(0) for orderless customers.
    */
  val q9eChurnFeatures: GraftQuery = GraftQuery(
    "q9e_churn_features",
    s"""WITH mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS max_d FROM orders),
       |feat AS (
       |  SELECT o_custkey,
       |         COUNT(DISTINCT o_orderkey) AS n_orders,
       |         CAST(CAST(SUM($revSql) AS VARCHAR) AS DOUBLE) AS total_spend,
       |         CAST(CAST(SUM(CAST(l_extendedprice * l_tax AS DECIMAL(38,4)))
       |              AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_freight,
       |         datediff('day', MIN(CAST(o_orderdate AS DATE)),
       |                  MAX(CAST(o_orderdate AS DATE))) AS tenure_days,
       |         MAX(CAST(o_orderdate AS DATE)) AS last_order
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  GROUP BY 1)
       |SELECT c_custkey,
       |       coalesce(n_orders, 0) AS n_orders,
       |       coalesce(total_spend, 0.0) AS total_spend,
       |       coalesce(avg_freight, 0.0) AS avg_freight,
       |       CAST(coalesce(tenure_days, 0) AS INTEGER) AS tenure_days,
       |       CAST(coalesce(datediff('day', last_order, mx.max_d), 99999)
       |            AS INTEGER) AS days_since_last,
       |       coalesce(datediff('day', last_order, mx.max_d), 99999) > 90
       |         AS churned
       |FROM customer LEFT JOIN feat ON c_custkey = o_custkey
       |CROSS JOIN mx""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val t = Tables(spark, dir)
    val feat = t.lineitem
      .join(t.orders, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_custkey")
      .agg(
        countDistinct($"o_orderkey").as("n_orders"),
        Exact.dsum(Exact.revenueExpr($"l_extendedprice", $"l_discount"))
          .as("total_spend"),
        (Exact.dsum($"l_extendedprice" * $"l_tax", 4) / count(lit(1)))
          .as("avg_freight"),
        datediff(max(to_date($"o_orderdate")), min(to_date($"o_orderdate")))
          .as("tenure_days"),
        max(to_date($"o_orderdate")).as("last_order"))
    val mx = t.orders.agg(max(to_date($"o_orderdate")).as("max_d"))
    t.customer
      .join(feat, $"c_custkey" === $"o_custkey", "left")
      .crossJoin(broadcast(mx))
      .select($"c_custkey",
        coalesce($"n_orders", lit(0)).as("n_orders"),
        coalesce($"total_spend", lit(0.0)).as("total_spend"),
        coalesce($"avg_freight", lit(0.0)).as("avg_freight"),
        coalesce($"tenure_days", lit(0)).as("tenure_days"),
        coalesce(datediff($"max_d", $"last_order"), lit(99999))
          .as("days_since_last"),
        (coalesce(datediff($"max_d", $"last_order"), lit(99999)) > 90)
          .as("churned"))
  }

  /** q9f — regional revenue share via window total + rank
    * (ref `PythonAnalysis.py:207-229`, A9/A15/O4).
    */
  val q9fRevenueShare: GraftQuery = GraftQuery(
    "q9f_revenue_share",
    s"""WITH n AS (
       |  SELECT n_name,
       |         CAST(CAST(SUM($revSql) AS VARCHAR) AS DOUBLE) AS revenue,
       |         COUNT(DISTINCT o_orderkey) AS n_orders,
       |         COUNT(DISTINCT o_custkey) AS n_customers
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation ON c_nationkey = n_nationkey
       |  GROUP BY 1)
       |SELECT n_name, revenue, n_orders, n_customers,
       |       revenue / CAST(CAST(SUM(CAST(revenue AS DECIMAL(38,6))) OVER ()
       |                     AS VARCHAR) AS DOUBLE) * 100 AS revenue_share_pct,
       |       CAST(RANK() OVER (ORDER BY revenue DESC, n_name) AS INTEGER)
       |         AS revenue_rank
       |FROM n""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val t = Tables(spark, dir)
    val byNation = t.lineitem
      .join(t.orders, $"l_orderkey" === $"o_orderkey")
      .join(t.customer, $"o_custkey" === $"c_custkey")
      .join(broadcast(t.nation), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(Exact.dsum(Exact.revenueExpr($"l_extendedprice", $"l_discount"))
        .as("revenue"),
        countDistinct($"o_orderkey").as("n_orders"),
        countDistinct($"o_custkey").as("n_customers"))
    byNation
      .withColumn("revenue_share_pct",
        $"revenue" / Exact.toDouble(
          sum($"revenue".cast(DecimalType(38, 6)))
            .over(Window.partitionBy())) * 100)
      .withColumn("revenue_rank",
        // Nullable-TIEBREAK convention (r15 heavytie fixture): a
        // revenue tie between a NULL-name and a named nation ranks
        // engine-asymmetrically under Spark's asc=NULLS FIRST default
        // vs DuckDB's NULLS LAST — pin NULLS LAST explicitly so the
        // nameless group sorts last on both engines; row membership
        // is unchanged (unlike the q15/q24c measure-exclusion
        // convention, a tiebreak never drops rows). Pinned by
        // HeavyTieSpec and mutation m42; see NULL_CONTRACT.md B.
        rank().over(Window.orderBy($"revenue".desc, $"n_name".asc_nulls_last)))
  }

  // coordinates + haversine shared via graft.functions.Geo (ref
  // `PythonAnalysis.py:63-79`, F7 — built-ins only, no UDF)
  import graft.functions.Geo.{demoLat => latOf, demoLng => lngOf,
    demoLatSql => latSql, demoLngSql => lngSql, haversineKm => haversine}
  private def haversineSql(lat1: String, lng1: String,
                           lat2: String, lng2: String): String =
    graft.functions.Geo.haversineSql(lat1, lng1, lat2, lng2)

  /** q9g — haversine customer↔supplier distance per line, averaged per
    * nation. Distances snap to DECIMAL(38,6) pre-aggregation so the
    * mean is order-free.
    */
  val q9gHaversine: GraftQuery = GraftQuery(
    "q9g_haversine",
    s"""SELECT n_name,
       |       COUNT(*) AS n_lines,
       |       CAST(CAST(SUM(CAST(${haversineSql(
              latSql("o_custkey"), lngSql("o_custkey"),
              latSql("l_suppkey"), lngSql("l_suppkey"))}
       |         AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) / COUNT(*)
       |         AS avg_distance_km
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |GROUP BY 1""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val t = Tables(spark, dir)
    val dist = haversine(
      latOf($"o_custkey"), lngOf($"o_custkey"),
      latOf($"l_suppkey"), lngOf($"l_suppkey"))
    t.lineitem
      .join(t.orders, $"l_orderkey" === $"o_orderkey")
      .join(t.customer, $"o_custkey" === $"c_custkey")
      .join(broadcast(t.nation), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_lines"),
        (Exact.dsum(dist) / count(lit(1))).as("avg_distance_km"))
  }

  /** q9h — price elasticity, closed-form log-log regression over price
    * bands (ref `PythonAnalysis.py:332-358`, M5 as exact aggregation:
    * slope = (nΣxy−ΣxΣy)/(nΣx²−(Σx)²), plus intercept and R²).
    * Per-band logs snap to DECIMAL(38,9) so the tiny second-level sums
    * are order-free.
    */
  val q9hElasticity: GraftQuery = GraftQuery(
    "q9h_elasticity",
    s"""WITH bands AS (
       |  SELECT CAST(floor(l_extendedprice / 5000) AS BIGINT) AS band,
       |         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
       |           / COUNT(*) AS avg_price,
       |         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
       |           AS demand
       |  FROM lineitem GROUP BY 1),
       |pts AS (
       |  SELECT CAST(ln(avg_price) AS DECIMAL(38,9)) AS x,
       |         CAST(ln(demand) AS DECIMAL(38,9)) AS y
       |  FROM bands WHERE avg_price > 0 AND demand > 0),
       |m AS (
       |  SELECT COUNT(*) AS n,
       |         CAST(CAST(SUM(x) AS VARCHAR) AS DOUBLE) AS sx,
       |         CAST(CAST(SUM(y) AS VARCHAR) AS DOUBLE) AS sy,
       |         CAST(CAST(SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
       |           AS DECIMAL(38,9)) ) AS VARCHAR) AS DOUBLE) AS sxx,
       |         CAST(CAST(SUM(CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)
       |           AS DECIMAL(38,9)) ) AS VARCHAR) AS DOUBLE) AS sxy,
       |         CAST(CAST(SUM(CAST(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)
       |           AS DECIMAL(38,9)) ) AS VARCHAR) AS DOUBLE) AS syy
       |  FROM pts)
       |SELECT n AS n_bands,
       |       (n * sxy - sx * sy) / (n * sxx - sx * sx) AS elasticity_slope,
       |       (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
       |         AS intercept,
       |       pow(n * sxy - sx * sy, 2)
       |         / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
       |FROM m""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val li = Tables(spark, dir).lineitem
    val bands = li
      .groupBy(floor($"l_extendedprice" / 5000).as("band"))
      .agg(Exact.davg($"l_extendedprice").as("avg_price"),
        Exact.dsum($"l_quantity").as("demand"))
    val pts = bands
      .filter($"avg_price" > 0 && $"demand" > 0)
      .select(log($"avg_price").cast(DecimalType(38, 9)).as("x"),
        log($"demand").cast(DecimalType(38, 9)).as("y"))
    val m = pts.agg(
      count(lit(1)).as("n"),
      Exact.toDouble(sum($"x")).as("sx"),
      Exact.toDouble(sum($"y")).as("sy"),
      Exact.toDouble(sum(($"x".cast(DoubleType) * $"x".cast(DoubleType))
        .cast(DecimalType(38, 9)))).as("sxx"),
      Exact.toDouble(sum(($"x".cast(DoubleType) * $"y".cast(DoubleType))
        .cast(DecimalType(38, 9)))).as("sxy"),
      Exact.toDouble(sum(($"y".cast(DoubleType) * $"y".cast(DoubleType))
        .cast(DecimalType(38, 9)))).as("syy"))
    m.select(
      $"n".as("n_bands"),
      (($"n" * $"sxy" - $"sx" * $"sy") / ($"n" * $"sxx" - $"sx" * $"sx"))
        .as("elasticity_slope"),
      (($"sy" - ($"n" * $"sxy" - $"sx" * $"sy")
        / ($"n" * $"sxx" - $"sx" * $"sx") * $"sx") / $"n").as("intercept"),
      (pow($"n" * $"sxy" - $"sx" * $"sy", 2)
        / (($"n" * $"sxx" - $"sx" * $"sx") * ($"n" * $"syy" - $"sy" * $"sy")))
        .as("r2"))
  }

  /** q9i — prescriptive freight optimization: distance bands
    * [0,100,300,500,1000,5000) km, −8% rate where on-time ≥ 90%
    * (ref `PythonAnalysis.py:388-428`, A12+M7).
    */
  val q9iFreightOpt: GraftQuery = GraftQuery(
    "q9i_freight_opt",
    s"""WITH lines AS (
       |  SELECT ${haversineSql(
            latSql("o_custkey"), lngSql("o_custkey"),
            latSql("l_suppkey"), lngSql("l_suppkey"))} AS dist,
       |         l_extendedprice * l_tax AS freight,
       |         CASE WHEN o_orderstatus = 'O' THEN NULL
       |              WHEN date_diff('day', CAST(o_orderdate AS DATE),
       |                             CAST(l_shipdate AS DATE)) <= 30 THEN 1.0
       |              ELSE 0.0 END AS on_time
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |banded AS (
       |  SELECT CASE WHEN dist < 100 THEN '0-100'
       |              WHEN dist < 300 THEN '100-300'
       |              WHEN dist < 500 THEN '300-500'
       |              WHEN dist < 1000 THEN '500-1000'
       |              ELSE '1000+' END AS dist_band,
       |         dist, freight, on_time FROM lines)
       |SELECT dist_band, COUNT(*) AS n_lines,
       |       CAST(CAST(SUM(CAST(freight / nullif(dist, 0) AS DECIMAL(38,6)))
       |            AS VARCHAR) AS DOUBLE) / COUNT(freight / nullif(dist, 0))
       |         AS avg_rate_per_km,
       |       CAST(CAST(SUM(CAST(on_time AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
       |         / COUNT(on_time) AS on_time_rate,
       |       CASE WHEN CAST(CAST(SUM(CAST(on_time AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
       |                 / COUNT(on_time) >= 0.90
       |            THEN CAST(CAST(SUM(CAST(freight / nullif(dist, 0) AS DECIMAL(38,6)))
       |                 AS VARCHAR) AS DOUBLE) / COUNT(freight / nullif(dist, 0)) * 0.92
       |            ELSE CAST(CAST(SUM(CAST(freight / nullif(dist, 0) AS DECIMAL(38,6)))
       |                 AS VARCHAR) AS DOUBLE) / COUNT(freight / nullif(dist, 0)) END
       |         AS recommended_rate
       |FROM banded GROUP BY 1""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val t = Tables(spark, dir)
    val dist = haversine(
      latOf($"o_custkey"), lngOf($"o_custkey"),
      latOf($"l_suppkey"), lngOf($"l_suppkey"))
    val delay = datediff(to_date($"l_shipdate"), to_date($"o_orderdate"))
    val onTime = when($"o_orderstatus" === "O", lit(null).cast(DoubleType))
      .when(delay <= 30, 1.0).otherwise(0.0)
    val lines = t.lineitem
      .join(t.orders, $"l_orderkey" === $"o_orderkey")
      .select(dist.as("dist"),
        ($"l_extendedprice" * $"l_tax").as("freight"),
        onTime.as("on_time"))
    val rate = $"freight" / nullif($"dist", lit(0))
    val banded = lines.select(
      when($"dist" < 100, "0-100")
        .when($"dist" < 300, "100-300")
        .when($"dist" < 500, "300-500")
        .when($"dist" < 1000, "500-1000")
        .otherwise("1000+").as("dist_band"),
      rate.as("rate"), $"on_time")
    val onTimeRate = Exact.dsum($"on_time") / count($"on_time")
    val avgRate   = Exact.dsum($"rate") / count($"rate")
    banded.groupBy($"dist_band")
      .agg(count(lit(1)).as("n_lines"),
        avgRate.as("avg_rate_per_km"),
        onTimeRate.as("on_time_rate"),
        when(onTimeRate >= 0.90, avgRate * 0.92).otherwise(avgRate)
          .as("recommended_rate"))
  }

  /** q9m — prescriptive delivery optimization (ref
    * `PythonAnalysis.py:516-533`, `prescriptive_delivery_optimization
    * .csv`): per region, on-time rate and mean delay-if-late with a
    * risk flag (< 85% on-time) and a rule-based recommendation.
    */
  val q9mDeliveryRisk: GraftQuery = GraftQuery(
    "q9m_delivery_risk",
    s"""WITH lines AS (
       |  SELECT n_name,
       |         CASE WHEN o_orderstatus = 'O' THEN NULL
       |              WHEN date_diff('day', CAST(o_orderdate AS DATE),
       |                             CAST(l_shipdate AS DATE)) <= 30 THEN 1.0
       |              ELSE 0.0 END AS on_time,
       |         CASE WHEN o_orderstatus <> 'O'
       |               AND date_diff('day', CAST(o_orderdate AS DATE),
       |                             CAST(l_shipdate AS DATE)) > 30
       |              THEN CAST(date_diff('day', CAST(o_orderdate AS DATE),
       |                        CAST(l_shipdate AS DATE)) AS DOUBLE) END AS delay
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation ON c_nationkey = n_nationkey)
       |SELECT n_name,
       |       CAST(CAST(SUM(CAST(on_time AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
       |         / COUNT(on_time) AS on_time_rate,
       |       CAST(CAST(SUM(CAST(delay AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
       |         / COUNT(delay) AS avg_delay_if_late,
       |       CAST(CAST(SUM(CAST(on_time AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
       |         / COUNT(on_time) < 0.85 AS at_risk,
       |       CASE WHEN CAST(CAST(SUM(CAST(on_time AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
       |                 / COUNT(on_time) < 0.85
       |            THEN 'add_carrier_capacity' ELSE 'maintain' END
       |         AS recommendation
       |FROM lines GROUP BY 1""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val t = Tables(spark, dir)
    val delayDays = datediff(to_date($"l_shipdate"), to_date($"o_orderdate"))
    val onTime = when($"o_orderstatus" === "O", lit(null).cast(DoubleType))
      .when(delayDays <= 30, 1.0).otherwise(0.0)
    val delay = when($"o_orderstatus" =!= "O" && delayDays > 30,
      delayDays.cast(DoubleType))
    val lines = t.lineitem
      .join(t.orders, $"l_orderkey" === $"o_orderkey")
      .join(t.customer, $"o_custkey" === $"c_custkey")
      .join(broadcast(t.nation), $"c_nationkey" === $"n_nationkey")
      .select($"n_name", onTime.as("on_time"), delay.as("delay"))
    val rate = Exact.dsum($"on_time") / count($"on_time")
    lines.groupBy($"n_name")
      .agg(rate.as("on_time_rate"),
        (Exact.dsum($"delay") / count($"delay")).as("avg_delay_if_late"),
        (rate < 0.85).as("at_risk"),
        when(rate < 0.85, "add_carrier_capacity").otherwise("maintain")
          .as("recommendation"))
  }

  /** q9n — the order-grain analytic extract (ref the 116-line
    * extraction SQL `PythonAnalysis.py:30-149`, S7): left-joined
    * dims, haversine distance, and a FILTER-ed aggregate (A5:
    * `MAX(x) FILTER (WHERE …)` as null-ignoring max(when)).
    */
  val q9nOrderExtract: GraftQuery = GraftQuery(
    "q9n_order_extract",
    s"""SELECT o_orderkey, o_orderstatus,
       |       n_name AS nation,
       |       COUNT(*) AS n_lines,
       |       CAST(CAST(SUM($revSql) AS VARCHAR) AS DOUBLE) AS revenue,
       |       CAST(CAST(SUM(CAST(l_extendedprice * l_tax AS DECIMAL(38,4)))
       |            AS VARCHAR) AS DOUBLE) AS total_freight,
       |       CAST(CAST(MAX(CAST(${haversineSql(
              latSql("o_custkey"), lngSql("o_custkey"),
              latSql("l_suppkey"), lngSql("l_suppkey"))} AS DECIMAL(38,6)))
       |         FILTER (WHERE l_returnflag <> 'R') AS VARCHAR) AS DOUBLE)
       |         AS max_kept_distance
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |LEFT JOIN customer ON o_custkey = c_custkey
       |LEFT JOIN nation ON c_nationkey = n_nationkey
       |GROUP BY 1, 2, 3""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val t = Tables(spark, dir)
    val dist = haversine(
      latOf($"o_custkey"), lngOf($"o_custkey"),
      latOf($"l_suppkey"), lngOf($"l_suppkey"))
    t.lineitem
      .join(t.orders, $"l_orderkey" === $"o_orderkey")
      .join(t.customer, $"o_custkey" === $"c_custkey", "left")
      .join(broadcast(t.nation), $"c_nationkey" === $"n_nationkey", "left")
      .groupBy($"o_orderkey", $"o_orderstatus", $"n_name".as("nation"))
      .agg(count(lit(1)).as("n_lines"),
        Exact.dsum(Exact.revenueExpr($"l_extendedprice", $"l_discount"))
          .as("revenue"),
        Exact.dsum($"l_extendedprice" * $"l_tax", 4).as("total_freight"),
        // FILTER-ed aggregate: null-ignoring max over the kept rows
        Exact.toDouble(
          max(when($"l_returnflag" =!= "R", dist.cast(DecimalType(38, 6)))))
          .as("max_kept_distance"))
  }

  /** q9o — GROUPED exact quantiles (per-nation customer-spend
    * quartiles), the group-by sibling of q9a's global describe().
    * The same exactness baseline / scale-path pairing rides in ONE
    * query: exact `percentile` (buffers a nation's customers — the
    * oracle-checked baseline) beside `percentile_approx` whose
    * per-nation estimates are verified in-plan by q9a's rank-interval
    * device (count(< x̂), count(≤ x̂) must intersect q·n ± n/1000) —
    * the DuckDB twin emits `quantile_cont` plus true literals, so the
    * hash gate fails if any grouped sketch leaves its guarantee.
    *
    * The customer-spend staging frame has TWO consumers (the stats
    * aggregate and the rank check), so it is materialized eagerly —
    * customer grain, corpus-reduced — rather than recomputing the
    * 3-table join per consumer (exchange reuse is not contractual;
    * see q12s). The 25-row stats frame broadcasts back.
    */
  val q9oGroupedQuantiles: GraftQuery = GraftQuery(
    "q9o_grouped_quantiles",
    s"""WITH cust AS (
       |  SELECT n_name, o_custkey,
       |         CAST(CAST(SUM($revSql) AS VARCHAR) AS DOUBLE) AS spend
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation ON c_nationkey = n_nationkey
       |  GROUP BY 1, 2)
       |SELECT n_name, COUNT(*) AS n,
       |       quantile_cont(spend, 0.25) AS p25,
       |       quantile_cont(spend, 0.5)  AS p50,
       |       quantile_cont(spend, 0.75) AS p75,
       |       true AS p25_ok, true AS p50_ok, true AS p75_ok
       |FROM cust GROUP BY 1""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val t = Tables(spark, dir)
    val cust = t.lineitem
      .join(t.orders, $"l_orderkey" === $"o_orderkey")
      .join(t.customer, $"o_custkey" === $"c_custkey")
      .join(broadcast(t.nation), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name", $"o_custkey")
      .agg(Exact.dsum(Exact.revenueExpr($"l_extendedprice", $"l_discount"))
        .as("spend"))
      .staged
    val stats = cust.groupBy($"n_name").agg(
      count(lit(1)).as("n"),
      percentile($"spend", lit(0.25)).as("p25"),
      percentile($"spend", lit(0.5)).as("p50"),
      percentile($"spend", lit(0.75)).as("p75"),
      percentile_approx($"spend", array(lit(0.25), lit(0.5), lit(0.75)),
        lit(10000)).as("pa"))
    // NULL-SAFE group-key rejoin (r15 heavytie fixture caught the
    // plain equi-join live): groupBy keeps a NULL n_name as a real
    // group on BOTH engines, but `=` can't join that group's rows
    // back to its own stats row — Spark silently dropped the whole
    // group while the twin (direct quantile_cont, no rejoin) kept it.
    // <=> (EqualNullSafe) is still a hash-join key, so the broadcast
    // plan shape is unchanged. Pinned by HeavyTieSpec + mutation m43;
    // see NULL_CONTRACT.md C.
    val checked = cust.join(broadcast(stats.withColumnRenamed("n_name", "__sn")),
        $"n_name" <=> $"__sn")
      .drop("__sn")
      .groupBy($"n_name")
      .agg(first($"n").as("n"), first($"p25").as("p25"),
        first($"p50").as("p50"), first($"p75").as("p75"),
        sum(when($"spend" < element_at($"pa", 1), 1L).otherwise(0L)).as("b25"),
        sum(when($"spend" <= element_at($"pa", 1), 1L).otherwise(0L)).as("a25"),
        sum(when($"spend" < element_at($"pa", 2), 1L).otherwise(0L)).as("b50"),
        sum(when($"spend" <= element_at($"pa", 2), 1L).otherwise(0L)).as("a50"),
        sum(when($"spend" < element_at($"pa", 3), 1L).otherwise(0L)).as("b75"),
        sum(when($"spend" <= element_at($"pa", 3), 1L).otherwise(0L)).as("a75"))
    val err = greatest(lit(1.0), $"n" / 1000.0)
    def ok(q: Double, below: String, atMost: String) =
      (col(below) <= lit(q) * $"n" + err) &&
        (col(atMost) >= lit(q) * $"n" - err)
    checked.select($"n_name", $"n", $"p25", $"p50", $"p75",
      ok(0.25, "b25", "a25").as("p25_ok"),
      ok(0.50, "b50", "a50").as("p50_ok"),
      ok(0.75, "b75", "a75").as("p75_ok"))
  }

  /** q9p — TWO-feature OLS (demand on price AND discount) solved in
    * closed form from the normal equations via Cramer's rule — the
    * multivariate extension of q9h's single-feature fit (M5). The ten
    * sufficient statistics (n, Σx₁, Σx₂, Σy, Σx₁², Σx₂², Σx₁x₂,
    * Σx₁y, Σx₂y, Σy²) aggregate once over the band points with the
    * same decimal-snap device as q9h, so they are order-free and
    * cross-engine exact; the 3×3 solve then runs on ONE row. The
    * determinant/solve arithmetic is ONE shared SQL string evaluated
    * by `expr()` in Spark and interpolated into the DuckDB twin —
    * textually identical expressions parse to the same operation tree
    * in both engines, so the double results are bitwise equal.
    * At scale this is the map-reduce regression recipe: sufficient
    * statistics are a partial-aggregable SUM, the solve is O(1).
    */
  val q9pMultiReg: GraftQuery = {
    // shared solve arithmetic over the sufficient-statistic columns
    val det =
      "(n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) + s2 * (s1 * s12 - s11 * s2))"
    val det0 =
      "(sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) + s2 * (s1y * s12 - s11 * s2y))"
    val det1 =
      "(n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) + s2 * (s1 * s2y - s1y * s2))"
    val det2 =
      "(n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) + sy * (s1 * s12 - s11 * s2))"
    // Solvability guard, shared by both engines, two conditions:
    //  - n > 3: with n ≤ 3 points the 3-parameter system is exactly-
    //    or under-determined — det → 0 and the solve amplifies
    //    sub-9dp quantization asymmetry (Spark's string-path vs
    //    DuckDB's multiply-then-round double→decimal cast) into
    //    arbitrary coefficients. A fit with zero residual degrees of
    //    freedom is statistically meaningless (flushed by the 3-row
    //    outlier warehouse).
    //  - det ≠ 0: n > 3 alone does not imply full rank — a CONSTANT
    //    regressor (dirty ingest default, e.g. discount ≡ 0 on every
    //    row) zeroes det EXACTLY at any n, and the raw det/det is a
    //    double 0/0, which THROWS under ANSI on Spark while DuckDB
    //    answers NaN (the dstddev engine-divergence class). Rank
    //    deficiency means no unique solution → NULL on both engines.
    // det is exact-moment-derived and textually shared, so the guard
    // decision is engine-identical; the bitwise cross-engine contract
    // holds for full-rank over-determined systems (degenerate-dir
    // twin audit, SURVEY §8.9).
    def solved(e: String) = s"CASE WHEN n > 3 AND $det <> 0 THEN $e END"
    val b0 = solved(s"$det0 / $det")
    val b1 = solved(s"$det1 / $det")
    val b2 = solved(s"$det2 / $det")
    val sse = s"(syy - (($b0) * sy + ($b1) * s1y + ($b2) * s2y))"
    val sst = "(syy - sy * sy / n)"
    val selectSql =
      s"""SELECT n AS n_points,
         |       $b0 AS intercept,
         |       $b1 AS beta_price,
         |       $b2 AS beta_discount,
         |       1 - $sse / $sst AS r2""".stripMargin
    GraftQuery(
      "q9p_multireg",
      s"""WITH bands AS (
         |  SELECT CAST(floor(l_extendedprice / 5000) AS BIGINT) AS band,
         |         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
         |           / COUNT(*) AS avg_price,
         |         CAST(CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
         |           / COUNT(*) AS avg_disc,
         |         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
         |           AS demand
         |  FROM lineitem GROUP BY 1),
         |pts AS (
         |  SELECT CAST(ln(avg_price) AS DECIMAL(38,9)) AS x1,
         |         CAST(avg_disc AS DECIMAL(38,9)) AS x2,
         |         CAST(ln(demand) AS DECIMAL(38,9)) AS y
         |  FROM bands WHERE avg_price > 0 AND demand > 0),
         |m AS (
         |  SELECT COUNT(*) AS n,
         |         CAST(CAST(SUM(x1) AS VARCHAR) AS DOUBLE) AS s1,
         |         CAST(CAST(SUM(x2) AS VARCHAR) AS DOUBLE) AS s2,
         |         CAST(CAST(SUM(y) AS VARCHAR) AS DOUBLE) AS sy,
         |         CAST(CAST(SUM(CAST(CAST(x1 AS DOUBLE) * CAST(x1 AS DOUBLE)
         |           AS DECIMAL(38,9))) AS VARCHAR) AS DOUBLE) AS s11,
         |         CAST(CAST(SUM(CAST(CAST(x2 AS DOUBLE) * CAST(x2 AS DOUBLE)
         |           AS DECIMAL(38,9))) AS VARCHAR) AS DOUBLE) AS s22,
         |         CAST(CAST(SUM(CAST(CAST(x1 AS DOUBLE) * CAST(x2 AS DOUBLE)
         |           AS DECIMAL(38,9))) AS VARCHAR) AS DOUBLE) AS s12,
         |         CAST(CAST(SUM(CAST(CAST(x1 AS DOUBLE) * CAST(y AS DOUBLE)
         |           AS DECIMAL(38,9))) AS VARCHAR) AS DOUBLE) AS s1y,
         |         CAST(CAST(SUM(CAST(CAST(x2 AS DOUBLE) * CAST(y AS DOUBLE)
         |           AS DECIMAL(38,9))) AS VARCHAR) AS DOUBLE) AS s2y,
         |         CAST(CAST(SUM(CAST(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)
         |           AS DECIMAL(38,9))) AS VARCHAR) AS DOUBLE) AS syy
         |  FROM pts)
         |$selectSql
         |FROM m""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val li = Tables(spark, dir).lineitem
      val bands = li
        .groupBy(floor($"l_extendedprice" / 5000).as("band"))
        .agg(Exact.davg($"l_extendedprice").as("avg_price"),
          Exact.davg($"l_discount").as("avg_disc"),
          Exact.dsum($"l_quantity").as("demand"))
      val pts = bands
        .filter($"avg_price" > 0 && $"demand" > 0)
        .select(log($"avg_price").cast(DecimalType(38, 9)).as("x1"),
          $"avg_disc".cast(DecimalType(38, 9)).as("x2"),
          log($"demand").cast(DecimalType(38, 9)).as("y"))
      def dprod(a: String, b: String) =
        sum((col(a).cast(DoubleType) * col(b).cast(DoubleType))
          .cast(DecimalType(38, 9)))
      val m = pts.agg(
        count(lit(1)).as("n"),
        Exact.toDouble(sum($"x1")).as("s1"),
        Exact.toDouble(sum($"x2")).as("s2"),
        Exact.toDouble(sum($"y")).as("sy"),
        Exact.toDouble(dprod("x1", "x1")).as("s11"),
        Exact.toDouble(dprod("x2", "x2")).as("s22"),
        Exact.toDouble(dprod("x1", "x2")).as("s12"),
        Exact.toDouble(dprod("x1", "y")).as("s1y"),
        Exact.toDouble(dprod("x2", "y")).as("s2y"),
        Exact.toDouble(dprod("y", "y")).as("syy"))
      // the SAME arithmetic string the oracle runs — identical
      // operation tree, identical doubles
      m.select(expr("n").as("n_points"),
        expr(b0).as("intercept"),
        expr(b1).as("beta_price"),
        expr(b2).as("beta_discount"),
        expr(s"1 - $sse / $sst").as("r2"))
    }
  }

  /** q9r — Kaplan–Meier survival of customer lifetimes, exact-integer
    * end to end. Duration = days from first to last order; a customer
    * whose last order sits within 90 days of the dataset end is
    * CENSORED at (end − first) instead of evented — the standard
    * right-censoring rule, on q9e's churn convention. The estimator
    *   S(t) = Π_{tᵢ ≤ t} (n_riskᵢ − dᵢ)/n_riskᵢ
    * is an ordered product, so it rides the q27 ordered-fold device
    * as an INTEGER recursion: s₀ = 10⁹, sₖ = sₖ₋₁·(n−d) div n —
    * bit-identical in Spark's array fold and DuckDB's recursive CTE
    * with no transcendental in sight (exp(Σln) would compound libm
    * wobble). Headroom: sₖ ≤ 10⁹ and n ≤ customers, so the product
    * stays inside BIGINT through n ≲ 9·10⁹ customers.
    *
    * Scale shape: the fact collapses to a DURATION histogram in one
    * hash agg; the risk-set arithmetic and the fold run at duration
    * grain (≤ the date-domain day count, the q20e calendar-window
    * budget) — never customer grain.
    */
  val q9rSurvivalKm: GraftQuery = GraftQuery(
    "q9r_survival_km",
    """WITH RECURSIVE cust AS (
      |  SELECT o_custkey, MIN(CAST(o_orderdate AS DATE)) AS f,
      |         MAX(CAST(o_orderdate AS DATE)) AS l
      |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
      |fin AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS dend FROM orders
      |        WHERE o_orderdate IS NOT NULL),
      |durs AS (
      |  SELECT CASE WHEN dend - l > 90 THEN l - f ELSE dend - f END AS dur,
      |         (dend - l > 90) AS churned
      |  FROM cust, fin),
      |hist AS (
      |  SELECT CAST(dur AS BIGINT) AS dur,
      |         CAST(COUNT(*) AS BIGINT) AS n_all,
      |         CAST(COUNT(CASE WHEN churned THEN 1 END) AS BIGINT) AS d
      |  FROM durs GROUP BY 1),
      |risk AS (
      |  SELECT dur, d,
      |         CAST((SELECT COUNT(*) FROM durs) -
      |           COALESCE(SUM(n_all) OVER (ORDER BY dur
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |           AS BIGINT) AS n_risk
      |  FROM hist),
      |steps AS (
      |  SELECT dur, n_risk, d,
      |         ROW_NUMBER() OVER (ORDER BY dur) AS k
      |  FROM risk WHERE d > 0),
      |km AS (
      |  SELECT dur, n_risk, d, k,
      |         CAST((1000000000 * (n_risk - d)) // n_risk AS BIGINT) AS s
      |  FROM steps WHERE k = 1
      |  UNION ALL
      |  SELECT st.dur, st.n_risk, st.d, st.k,
      |         CAST((km.s * (st.n_risk - st.d)) // st.n_risk AS BIGINT)
      |  FROM steps st JOIN km ON st.k = km.k + 1)
      |SELECT dur AS t_days, n_risk, d AS n_events, s AS survival_q9
      |FROM km""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    // an undateable order has no place on a lifetime axis — excluded
    // on BOTH engines (the q15/q24c convention): unfiltered, a
    // never-datable customer's NULL duration bucket sits NULLS-FIRST
    // in Spark's risk-set cumulative window and NULLS-LAST in
    // DuckDB's, shifting every n_risk (r13 mixed-null fixture,
    // SURVEY §8.11)
    val o = Tables(spark, dir).orders
      .select($"o_custkey", to_date($"o_orderdate").as("d"))
      .filter($"d".isNotNull)
    val cust = o.groupBy($"o_custkey")
      .agg(min($"d").as("f"), max($"d").as("l"))
    val fin = o.agg(max($"d").as("dend"))
    val durs = cust.crossJoin(broadcast(fin))
      .select(
        when(datediff($"dend", $"l") > 90, datediff($"l", $"f"))
          .otherwise(datediff($"dend", $"f")).cast("long").as("dur"),
        (datediff($"dend", $"l") > 90).as("churned"))
    val hist = durs.groupBy($"dur")
      .agg(count(lit(1)).as("n_all"),
        count(when($"churned", 1)).as("d"))
    val total = durs.agg(count(lit(1)).as("n_total"))
    // duration-grain window (calendar-bounded single partition — the
    // documented q20e budget, never customer grain)
    val w = org.apache.spark.sql.expressions.Window.orderBy($"dur")
      .rowsBetween(Long.MinValue, -1)
    val risk = hist.crossJoin(broadcast(total))
      .withColumn("n_risk",
        $"n_total" - coalesce(sum($"n_all").over(w), lit(0L)))
      .filter($"d" > 0)
      .select($"dur", $"n_risk", $"d")
    risk.agg(array_sort(collect_list(struct($"dur", $"n_risk", $"d")))
        .as("arr"))
      // degenerate input (no duration has an event → empty arr) must
      // yield an EMPTY frame on both engines, not a slice(arr, 2, -1)
      // runtime error here while DuckDB returns zero rows (the q27b
      // size guard device)
      .filter(size($"arr") >= 1)
      .select(explode(expr(
        """aggregate(
          |  slice(arr, 2, size(arr) - 1),
          |  array(named_struct(
          |    'dur', element_at(arr, 1).dur,
          |    'n_risk', element_at(arr, 1).n_risk,
          |    'd', element_at(arr, 1).d,
          |    's', (1000000000L * (element_at(arr, 1).n_risk
          |            - element_at(arr, 1).d))
          |         div element_at(arr, 1).n_risk)),
          |  (acc, x) -> concat(acc, array(named_struct(
          |    'dur', x.dur, 'n_risk', x.n_risk, 'd', x.d,
          |    's', (element_at(acc, -1).s * (x.n_risk - x.d))
          |         div x.n_risk))))""".stripMargin)).as("e"))
      .select($"e.dur".as("t_days"), $"e.n_risk".as("n_risk"),
        $"e.d".as("n_events"), $"e.s".as("survival_q9"))
  }

  /** q9s — A/B experiment readout: two-proportion z-test per metric,
    * the BI primitive behind every "did the promo work". Variant
    * assignment is the deterministic o_custkey parity; two metrics
    * ship — the ORGANIC urgent-priority conversion (assignment is
    * independent of priority, so the null should generally hold) and
    * a PLANTED treatment effect (variant B converts on orderkey%4,
    * A only on %8 — a designed ~2× lift the test must flag). All
    * inputs are integer counts; the pooled z² statistic is the one
    * double expression, evaluated with the identical tree on both
    * engines and quantized ⌊·10⁶+½⌋ (the q26c idf device), with
    * significance an INTEGER compare against quantized χ²₀.₀₅ =
    * 3.841459. One pass over orders per metric, 1-row outputs.
    */
  val q9sAbTest: GraftQuery = {
    def metricSql(name: String, convExpr: String): String =
      s"""SELECT '$name' AS metric,
         |  CAST(SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |  CAST(SUM(CASE WHEN v = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
         |  CAST(SUM(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         |  CAST(SUM(CASE WHEN v = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv_b
         |FROM (SELECT o_custkey % 2 AS v, $convExpr AS conv FROM orders)"""
        .stripMargin
    GraftQuery(
      "q9s_ab_test",
      s"""WITH agg AS (
         |${metricSql("organic_urgent",
            "CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END")}
         |UNION ALL
         |${metricSql("planted_lift",
            """CASE WHEN o_custkey % 2 = 1
              |     THEN CASE WHEN o_orderkey % 4 = 0 THEN 1 ELSE 0 END
              |     ELSE CASE WHEN o_orderkey % 8 = 0 THEN 1 ELSE 0 END
              |END""".stripMargin)}),
         |z AS (
         |  SELECT metric, n_a, conv_a, n_b, conv_b,
         |         CASE WHEN n_a > 0 AND n_b > 0
         |                AND conv_a + conv_b > 0
         |                AND conv_a + conv_b < n_a + n_b
         |         THEN CAST(FLOOR(
         |           (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
         |           * (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
         |           / ((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
         |              * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
         |              * (1.0 / n_a + 1.0 / n_b)) * 1e6 + 0.5) AS BIGINT)
         |         ELSE NULL END AS z2_q6
         |  FROM agg)
         |SELECT metric, n_a, conv_a, n_b, conv_b, z2_q6,
         |       z2_q6 > 3841458 AS significant
         |FROM z""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val o = Tables(spark, dir).orders
      def metric(name: String, conv: Column): DataFrame = o
        .select(($"o_custkey" % 2).as("v"), conv.cast("long").as("conv"))
        .agg(
          sum(when($"v" === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when($"v" === 0, $"conv").otherwise(0L)).as("conv_a"),
          sum(when($"v" === 1, 1L).otherwise(0L)).as("n_b"),
          sum(when($"v" === 1, $"conv").otherwise(0L)).as("conv_b"))
        .select(lit(name).as("metric"), $"n_a", $"conv_a", $"n_b", $"conv_b")
      val organic = metric("organic_urgent",
        when($"o_orderpriority" === "1-URGENT", 1L).otherwise(0L))
      val planted = metric("planted_lift",
        when($"o_custkey" % 2 === 1,
          when($"o_orderkey" % 4 === 0, 1L).otherwise(0L))
          .otherwise(when($"o_orderkey" % 8 === 0, 1L).otherwise(0L)))
      organic.unionByName(planted)
        // the CASE arms mirror the twin exactly; the guard makes the
        // statistic NULL (not a divide-by-zero) when an arm is empty
        // or the pooled rate is 0 or 1 — z is undefined there
        .withColumn("z2_q6", expr(
          """CASE WHEN n_a > 0 AND n_b > 0
            |       AND conv_a + conv_b > 0
            |       AND conv_a + conv_b < n_a + n_b
            |THEN CAST(FLOOR(
            |  (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
            |  * (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
            |  / ((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
            |     * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
            |     * (1.0 / n_a + 1.0 / n_b)) * 1e6 + 0.5) AS BIGINT)
            |ELSE NULL END""".stripMargin))
        .withColumn("significant", $"z2_q6" > 3841458L)
    }
  }

  val all: Seq[GraftQuery] = Seq(
    q9aDescriptiveStats, q9aApproxDescriptiveStats, q9bCorrelations,
    q9cBinnedAgg, q9dSegmentation, q9dApproxSegmentation,
    q9eChurnFeatures, q9fRevenueShare, q9gHaversine, q9hElasticity,
    q9iFreightOpt, q9mDeliveryRisk, q9nOrderExtract, q9oGroupedQuantiles,
    q9pMultiReg, q9rSurvivalKm, q9sAbTest)
}
