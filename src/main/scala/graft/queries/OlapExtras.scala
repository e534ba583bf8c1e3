package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.Exact

/** OLAP shape operators rounding out the §2.4 family: pivot (the
  * Power-BI matrix shape the reference renders in its dashboard) and
  * CUBE (completing GROUPING SETS / ROLLUP). Oracle twins express
  * pivot as portable conditional aggregation and CUBE natively.
  */
object OlapExtras {

  private val revSql =
    "CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))"

  private val segments =
    Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")

  /** q20a — pivot: yearly revenue, one column per market segment. */
  val q20aPivot: GraftQuery = GraftQuery(
    "q20a_pivot_segments",
    s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       |${segments.map(s =>
          s"""       CAST(CAST(coalesce(SUM(CASE WHEN c_mktsegment = '$s'
             |         THEN $revSql END), 0) AS VARCHAR) AS DOUBLE) AS ${s.toLowerCase}""".stripMargin)
          .mkString(",\n")}
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |GROUP BY 1""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val t = Tables(spark, dir)
    t.lineitem
      .join(t.orders, $"l_orderkey" === $"o_orderkey")
      .join(t.customer, $"o_custkey" === $"c_custkey")
      .groupBy(year($"o_orderdate").as("o_year"))
      .pivot("c_mktsegment", segments)
      .agg(sum(Exact.revenueExpr($"l_extendedprice", $"l_discount")
        .cast(DecimalType(38, 6))))
      .select($"o_year" +: segments.map(s =>
        Exact.toDouble(coalesce(col(s), lit(0).cast(DecimalType(38, 6))))
          .as(s.toLowerCase)): _*)
  }

  /** q20b — CUBE over (year, returnflag): all four grouping
    * combinations with GROUPING() labels. Twin `HAVING COUNT(*) > 0`
    * = the q2a empty-input grand-total device (no-op on non-empty
    * groups; see AnalyticalQueries.q2aGroupingSets).
    */
  val q20bCube: GraftQuery = GraftQuery(
    "q20b_cube",
    s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       |       l_returnflag,
       |       CASE WHEN GROUPING(year(o_orderdate)) = 1
       |             AND GROUPING(l_returnflag) = 1 THEN 'GRAND TOTAL'
       |            WHEN GROUPING(year(o_orderdate)) = 1 THEN 'FLAG TOTAL'
       |            WHEN GROUPING(l_returnflag) = 1 THEN 'YEAR TOTAL'
       |            ELSE 'DETAIL' END AS row_type,
       |       CAST(CAST(SUM($revSql) AS VARCHAR) AS DOUBLE) AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY CUBE (year(o_orderdate), l_returnflag)
       |HAVING COUNT(*) > 0""".stripMargin) {
    (spark, dir) =>
      import spark.implicits._
      val t = Tables(spark, dir)
      t.lineitem
        .join(t.orders, $"l_orderkey" === $"o_orderkey")
        .select(year($"o_orderdate").as("o_year"), $"l_returnflag",
          Exact.revenueExpr($"l_extendedprice", $"l_discount")
            .cast(DecimalType(38, 6)).as("rev"))
        .cube($"o_year", $"l_returnflag")
        .agg(
          when(grouping($"o_year") === 1 && grouping($"l_returnflag") === 1,
            "GRAND TOTAL")
            .when(grouping($"o_year") === 1, "FLAG TOTAL")
            .when(grouping($"l_returnflag") === 1, "YEAR TOTAL")
            .otherwise("DETAIL").as("row_type"),
          Exact.toDouble(sum($"rev")).as("revenue"))
  }

  /** q20c — calendar densify / gap-fill: every day in the data's
    * [min, max] ship-date range appears, zero-filled where no lines
    * shipped (`sequence` generator + left join + coalesce — the
    * dashboard-feeding "resample" shape).
    */
  val q20cDensify: GraftQuery = GraftQuery(
    "q20c_densify_days",
    s"""WITH daily AS (
       |  SELECT CAST(l_shipdate AS DATE) AS d, SUM($revSql) AS rev
       |  FROM lineitem GROUP BY 1),
       |bounds AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM daily),
       |cal AS (
       |  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
       |    AS d
       |  FROM bounds)
       |SELECT CAST(cal.d AS VARCHAR) AS ship_day,
       |       CAST(CAST(coalesce(daily.rev, 0) AS VARCHAR) AS DOUBLE)
       |         AS revenue,
       |       daily.rev IS NULL AS gap_filled
       |FROM cal LEFT JOIN daily ON cal.d = daily.d""".stripMargin) {
    (spark, dir) =>
      import spark.implicits._
      val li = Tables(spark, dir).lineitem
      val daily = li.groupBy(to_date($"l_shipdate").as("d"))
        .agg(sum(Exact.revenueExpr($"l_extendedprice", $"l_discount")
          .cast(DecimalType(38, 6))).as("rev"))
      val bounds = daily.agg(min($"d").as("lo"), max($"d").as("hi"))
      val cal = bounds.select(
        explode(sequence($"lo", $"hi", expr("interval 1 day"))).as("d"))
      cal.join(daily, Seq("d"), "left")
        .select($"d".cast(StringType).as("ship_day"),
          Exact.toDouble(coalesce($"rev", lit(0).cast(DecimalType(38, 6))))
            .as("revenue"),
          $"rev".isNull.as("gap_filled"))
  }

  /** q20d — unpivot/melt: the four lineitem measures to long form
    * (`Dataset.unpivot`, the inverse of q20a's pivot), re-aggregated
    * per measure. Oracle expresses the melt as UNION ALL; each branch
    * carries `GROUP BY 1` on the constant label so an EMPTY feed
    * yields zero rows on both engines (Spark's groupBy(measure)
    * semantics) instead of four global-aggregate COUNT=0 rows — the
    * q2a empty-input device, UNION-ALL form (degenerate-dir twin
    * audit, SURVEY §8.9).
    */
  val q20dUnpivot: GraftQuery = {
    val measures = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    GraftQuery(
      "q20d_unpivot_measures",
      measures.map(m =>
        s"""SELECT '$m' AS measure, COUNT(*) AS n,
           |  CAST(CAST(SUM(CAST($m AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
           |    AS total
           |FROM lineitem GROUP BY 1""".stripMargin).mkString("\nUNION ALL\n")) {
      (spark, dir) =>
        import spark.implicits._
        Tables(spark, dir).lineitem
          .unpivot(
            ids = Array(col("l_orderkey"), col("l_linenumber")),
            values = measures.map(col).toArray,
            variableColumnName = "measure",
            valueColumnName = "value")
          .groupBy($"measure")
          .agg(count(lit(1)).as("n"), Exact.dsum($"value").as("total"))
    }
  }

  /** q21 — top-3 customers by revenue per nation through the
    * [[graft.functions.TopK.TopKAggregator]] (§2.12's typed custom
    * aggregate): a single-pass mergeable bounded heap — O(k) state
    * per partial, map-side combine — where the window form sorts each
    * nation's full customer list to keep 3 rows. The oracle IS that
    * window form, so the hash gate proves the heap reproduces exact
    * top-k (ties break on customer id ascending in both). Revenue
    * enters the heap as the SAME string-roundtripped double the
    * output carries, so ordering and values agree bit-for-bit.
    */
  val q21TopkPerNation: GraftQuery = GraftQuery(
    "q21_topk_per_nation",
    s"""WITH rev AS (
       |  SELECT n_name, c_custkey,
       |         CAST(CAST(SUM($revSql) AS VARCHAR) AS DOUBLE) AS revenue
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation ON c_nationkey = n_nationkey
       |  GROUP BY 1, 2)
       |SELECT n_name, c_custkey, revenue, rk FROM (
       |  SELECT n_name, c_custkey, revenue,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY n_name
       |           ORDER BY revenue DESC, c_custkey) AS INTEGER) AS rk
       |  FROM rev WHERE revenue IS NOT NULL)
       |WHERE rk <= 3""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val t = Tables(spark, dir)
    // Null contract (q15/q24c convention, r15 `linkedmixed` fixture
    // exhibited it live): a revenue-less customer group has no place
    // in a revenue top-k, so it is excluded on BOTH engines BEFORE
    // the pick. Since r16 the TopKAggregator itself also IGNORES
    // null scores (TopK.topk bakes in a boxed-input encoder; the old
    // primitive encoder coerced NULL to 0.0, conflating "no revenue
    // data" with "zero revenue"); the filter stays as the
    // convention's explicit statement AND the cheaper plan (null
    // groups drop before the second shuffle). Pinned by
    // LinkedMixedSpec's q21 expectation and mutation m44 (retooled
    // r16 onto the operator branch, TopKSpec-gated — dropping ONLY
    // this filter is now an equivalent mutant by design: that is
    // what defense-in-depth means); see NULL_CONTRACT.md.
    val rev = AnalyticalQueries.nationCustRevenue(t)
      .filter($"revenue".isNotNull)
    val top3 = graft.functions.TopK.topk(3)
    rev
      .groupBy($"n_name")
      .agg(top3($"revenue", $"c_custkey").as("top"))
      .select($"n_name", posexplode($"top").as(Seq("pos", "e")))
      .select($"n_name", $"e._2".as("c_custkey"),
        $"e._1".as("revenue"), ($"pos" + 1).cast(IntegerType).as("rk"))
  }

  /** q22 — incremental aggregate maintenance: the historical
    * partition's aggregate STATE (tiny — one row per group, carrying
    * count + exact decimal sum) merges with the fresh partition's
    * delta aggregate by re-aggregating their union. History is never
    * rescanned — the daily cost is one pass over the NEW data plus a
    * group-count-sized merge, the only sane shape for a rolling
    * 100 TB fact. Count and decimal-sum partials merge associatively
    * (that is WHY the state carries sums, not averages); the final
    * double conversion happens once, after the merge, through the
    * exact string path. The oracle is the full recompute over all
    * data, so the gate proves merge(state, delta) ≡ recompute.
    * Both sides exclude NULL order dates: the incremental contract
    * partitions history BY DATE, and an undateable row belongs to
    * neither the state nor the delta (it is error-sink material, the
    * q17i/j/k principle) — the Spark split predicates already drop it
    * (NULL fails both `< cutoff` and `>= cutoff`), so the recompute
    * twin must too or the gate diverges on dirty feeds.
    */
  val q22IncrementalAgg: GraftQuery = GraftQuery(
    "q22_incremental_agg",
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
      |       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS VARCHAR)
      |            AS DOUBLE) AS total
      |FROM orders WHERE o_orderdate IS NOT NULL
      |GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val orders = Tables(spark, dir).orders
    val cutoff = "1997-01-01"
    def partial(df: org.apache.spark.sql.DataFrame) = df
      .groupBy($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum($"o_totalprice".cast(DecimalType(38, 6))).as("part"))
    // state: would be READ from the stored agg table in production —
    // aggregated here from the historical slice for the self-check
    val state = partial(orders.filter($"o_orderdate" < cutoff))
    val delta = partial(orders.filter($"o_orderdate" >= cutoff))
    state.unionByName(delta)
      .groupBy($"o_orderstatus", $"o_orderpriority")
      .agg(sum($"n_orders").as("n_orders"),
        Exact.toDouble(sum($"part")).as("total"))
  }

  /** q27 — exponential smoothing (EMA) of monthly segment revenue:
    * s₁ = r₁, sₜ = ¼·rₜ + ¾·sₜ₋₁. An ORDERED RECURRENCE — the one
    * time-series shape window frames cannot express (each output
    * depends on the previous OUTPUT, not a previous input) — so Spark
    * runs it as a per-group array fold (the q12r ordered-fold device:
    * sort the grouped months, fold left appending each smoothed value)
    * while DuckDB runs a RECURSIVE CTE stepping t → t+1. α = ¼ and
    * 1−α = ¾ are exact binary, the monthly revenue is an exact decimal
    * sum string-roundtripped to double, and both engines evaluate the
    * same `¼·r + ¾·s` expression tree — so the chains match bitwise.
    *
    * Scale: the fold runs at SEGMENT grain over month-count-bounded
    * arrays (a few dozen elements — grain is fixed by the calendar,
    * not the corpus), after a standard (segment, month) hash agg.
    */
  val q27ExpSmoothing: GraftQuery = GraftQuery(
    "q27_exp_smoothing",
    """WITH RECURSIVE monthly AS (
      |  SELECT c_mktsegment, strftime(o_orderdate, '%Y-%m') AS mon,
      |         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS VARCHAR)
      |           AS DOUBLE) AS rev
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE o_orderdate IS NOT NULL
      |  GROUP BY 1, 2),
      |idx AS (
      |  SELECT c_mktsegment, mon, rev,
      |         ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY mon) AS t
      |  FROM monthly),
      |ema AS (
      |  SELECT c_mktsegment, mon, rev, t, rev AS ema FROM idx WHERE t = 1
      |  UNION ALL
      |  SELECT i.c_mktsegment, i.mon, i.rev, i.t, 0.25 * i.rev + 0.75 * e.ema
      |  FROM idx i JOIN ema e
      |    ON i.c_mktsegment = e.c_mktsegment AND i.t = e.t + 1)
      |SELECT c_mktsegment, mon, rev, ema FROM ema""".stripMargin) {
    (spark, dir) =>
      import spark.implicits._
      val t = Tables(spark, dir)
      // Null contract (q15/q24c measure-exclusion convention, the r16
      // `linkedseq` fixture exhibited it live): an UNDATEABLE order
      // has no month, so it is excluded from the monthly series on
      // BOTH engines — without the exclusion the NULL-mon bucket
      // sorts FIRST inside array_sort's struct ordering (an
      // EXPRESSION-level sort the NullOrderCensus cannot even see —
      // no Sort/Window node) and SEEDS the EMA recurrence, while
      // DuckDB's ROW_NUMBER ranks it last. Pinned by LinkedSeqSpec +
      // mutation m49; see NULL_CONTRACT.md.
      val monthly = t.orders
        .filter($"o_orderdate".isNotNull)
        .join(t.customer, $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment",
          date_format($"o_orderdate", "yyyy-MM").as("mon"))
        .agg(Exact.dsum($"o_totalprice").as("rev"))
      monthly
        .groupBy($"c_mktsegment")
        .agg(array_sort(collect_list(struct($"mon", $"rev"))).as("arr"))
        .select($"c_mktsegment", explode(expr(
          """aggregate(
            |  slice(arr, 2, size(arr) - 1),
            |  array(named_struct(
            |    'mon', element_at(arr, 1).mon,
            |    'rev', element_at(arr, 1).rev,
            |    'ema', element_at(arr, 1).rev)),
            |  (acc, x) -> concat(acc, array(named_struct(
            |    'mon', x.mon, 'rev', x.rev,
            |    'ema', 0.25D * x.rev + 0.75D * element_at(acc, -1).ema))))"""
            .stripMargin)).as("e"))
        .select($"c_mktsegment", $"e.mon".as("mon"),
          $"e.rev".as("rev"), $"e.ema".as("ema"))
  }

  /** q20e — gap-fill with LINEAR INTERPOLATION (the pandas
    * `interpolate` analog, completing q20c's zero-fill densify):
    * missing calendar days get prev + (next−prev)·offset/gap, done
    * entirely in INTEGER cents with integer division — order-free,
    * bitwise-identical cross-engine. prev/next ride
    * last/first(IGNORE NULLS) frames over the densified spine.
    *
    * Scale: the corpus collapses at the daily hash-agg; every window
    * after that is CALENDAR-grain (≤ a few thousand rows however big
    * the fact is), so the single-partition window is bounded by the
    * date range, never by the data — the same budget q20c/q27 run on.
    * The spine never extends beyond observed bounds, so interior gaps
    * always have both neighbors and the formula needs no edge case.
    */
  val q20eGapfillInterp: GraftQuery = GraftQuery(
    "q20e_gapfill_interp",
    """WITH daily AS (
      |  SELECT CAST(l_shipdate AS DATE) AS d,
      |         CAST(SUM(CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5)
      |                       AS BIGINT)) AS BIGINT) AS cents
      |  FROM lineitem WHERE l_orderkey % 50 = 0 GROUP BY 1),
      |bounds AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM daily),
      |cal AS (
      |  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
      |    AS d
      |  FROM bounds),
      |sp AS (
      |  SELECT cal.d, daily.cents,
      |         cal.d - DATE '1970-01-01' AS day_i
      |  FROM cal LEFT JOIN daily ON cal.d = daily.d),
      |nb AS (
      |  SELECT d, cents, day_i,
      |    last_value(cents IGNORE NULLS) OVER
      |      (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS pv,
      |    last_value(CASE WHEN cents IS NOT NULL THEN day_i END
      |               IGNORE NULLS) OVER
      |      (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS pd,
      |    first_value(cents IGNORE NULLS) OVER
      |      (ORDER BY d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      |      AS nv,
      |    first_value(CASE WHEN cents IS NOT NULL THEN day_i END
      |                IGNORE NULLS) OVER
      |      (ORDER BY d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      |      AS nd
      |  FROM sp)
      |SELECT CAST(d AS VARCHAR) AS ship_day,
      |       CAST(CASE WHEN cents IS NOT NULL THEN cents
      |            ELSE pv + ((nv - pv) * (day_i - pd)) // (nd - pd) END
      |            AS BIGINT) AS rev_cents,
      |       cents IS NULL AS gap_filled
      |FROM nb""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val daily = Tables(spark, dir).lineitem
      .filter($"l_orderkey" % 50 === 0)
      .groupBy(to_date($"l_shipdate").as("d"))
      .agg(sum(floor($"l_extendedprice" * (lit(1) - $"l_discount") * 100
        + 0.5).cast("long")).as("cents"))
    val bounds = daily.agg(min($"d").as("lo"), max($"d").as("hi"))
    val cal = bounds.select(
      explode(sequence($"lo", $"hi", expr("interval 1 day"))).as("d"))
    import org.apache.spark.sql.expressions.Window
    val sp = cal.join(daily, Seq("d"), "left")
      .withColumn("day_i", unix_date($"d").cast("long"))
    val wPrev = Window.orderBy($"d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.orderBy($"d")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    sp.withColumn("pv", last($"cents", ignoreNulls = true).over(wPrev))
      .withColumn("pd", last(when($"cents".isNotNull, $"day_i"),
        ignoreNulls = true).over(wPrev))
      .withColumn("nv", first($"cents", ignoreNulls = true).over(wNext))
      .withColumn("nd", first(when($"cents".isNotNull, $"day_i"),
        ignoreNulls = true).over(wNext))
      .select($"d".cast(StringType).as("ship_day"),
        when($"cents".isNotNull, $"cents")
          .otherwise($"pv" + expr("((nv - pv) * (day_i - pd)) div (nd - pd)"))
          .as("rev_cents"),
        $"cents".isNull.as("gap_filled"))
  }

  /** q9q — weighted median per group (quantity weighted by exact
    * revenue cents): the robust central-tendency stat the describe()
    * family lacks, and the textbook case where the SCALE-SOUND plan is
    * not the obvious one. The obvious form windows over raw fact rows
    * (a nation-sized partition in one task); this one collapses to
    * VALUE GRAIN first — (group, quantity) cells with integer weight
    * sums, ≤ ~50 rows per group whatever the fact size — then runs the
    * cumulative-weight window on cells and picks the first value whose
    * doubled cumulative weight reaches the total (the lower weighted
    * median, an integer rule both engines apply identically; no
    * interpolation, no floats).
    *
    * Null contract (q15/q24c convention, NULL_CONTRACT.md A): a
    * NULL-quantity row cannot
    * participate in a quantity median, so it is excluded from the
    * value-grain cells on BOTH engines — otherwise its weight rides
    * the cumulative window FIRST under Spark's nulls-first ascending
    * but LAST under DuckDB's nulls-last, shifting every real cell's
    * `cw` by the null cell's weight and with it the 2·cw ≥ tw pick
    * (exhibited by the r14 `heavy` fixture: a 10000¢ null cell over
    * three 1000¢ real cells made Spark pick qty=1 while no real cell
    * reached the twin's threshold → NULL median). Exclusion also
    * removes the null weight from total_weight_cents and the null
    * cell from n_cells, consistently on both engines.
    */
  val q9qWeightedMedian: GraftQuery = GraftQuery(
    "q9q_weighted_median",
    """WITH cells AS (
      |  SELECT l_returnflag, l_linestatus,
      |         CAST(l_quantity AS BIGINT) AS qty,
      |         CAST(SUM(CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5)
      |                       AS BIGINT)) AS BIGINT) AS w
      |  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1, 2, 3),
      |cum AS (
      |  SELECT l_returnflag, l_linestatus, qty, w,
      |         CAST(SUM(w) OVER (PARTITION BY l_returnflag, l_linestatus
      |           ORDER BY qty ROWS BETWEEN UNBOUNDED PRECEDING AND
      |           CURRENT ROW) AS BIGINT) AS cw,
      |         CAST(SUM(w) OVER (PARTITION BY l_returnflag, l_linestatus)
      |              AS BIGINT) AS tw
      |  FROM cells)
      |SELECT l_returnflag, l_linestatus,
      |       CAST(MIN(CASE WHEN 2*cw >= tw THEN qty END) AS BIGINT)
      |         AS weighted_median_qty,
      |       CAST(MIN(tw) AS BIGINT) AS total_weight_cents,
      |       COUNT(*) AS n_cells
      |FROM cum GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val cells = Tables(spark, dir).lineitem
      .filter($"l_quantity".isNotNull)
      .groupBy($"l_returnflag", $"l_linestatus",
        $"l_quantity".cast("long").as("qty"))
      .agg(sum(floor($"l_extendedprice" * (lit(1) - $"l_discount") * 100
        + 0.5).cast("long")).as("w"))
    val wCum = Window.partitionBy($"l_returnflag", $"l_linestatus")
      .orderBy($"qty")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy($"l_returnflag", $"l_linestatus")
    cells
      .withColumn("cw", sum($"w").over(wCum))
      .withColumn("tw", sum($"w").over(wTot))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(min(when($"cw" * 2 >= $"tw", $"qty")).as("weighted_median_qty"),
        min($"tw").as("total_weight_cents"),
        count(lit(1)).as("n_cells"))
  }

  /** q9u — robust outlier detection per segment via median/MAD, the
    * data-quality screen mean/stddev cannot do (one planted whale
    * shifts a z-score threshold; the median absolute deviation
    * ignores it). Everything is INTEGER: order totals collapse to
    * $100-unit VALUE-GRAIN cells (domain-bounded — the q9q scale
    * rule), the segment median is the lower median over cells, MAD is
    * the lower median of |v − med| cells, and the outlier rule
    * |v − med|·10⁴ > 44478·MAD is the integer form of
    * |x − med| > 3·1.4826·MAD. Deterministic positives are PLANTED
    * (every o_orderkey%97 order re-entered at 10× its total) so the
    * audit can never pass vacuously.
    *
    * Null contract (the q15/q24c convention, NULL_CONTRACT.md A,
    * monetary axis — r15
    * `heavyprice` fixture exhibited the divergence live): a
    * price-less order has no place in a price median, so it is
    * excluded from the value cells on BOTH engines (engine
    * `.filter`, twin `WHERE o_totalprice IS NOT NULL`). Without the
    * exclusion the NULL cell rides Spark's nulls-first ascending
    * cumulation and shifts every real cell's 2·cn ≥ tn pick, while
    * DuckDB's nulls-last shifts none (heavyprice: spark median 2 vs
    * duck 3 pre-fix). Exclusion also removes the null rows from
    * n_rows, consistently on both engines. Pinned by MadOutliersSpec
    * (hand-derived heavyprice expectation) and mutation m41.
    */
  val q9uMadOutliers: GraftQuery = GraftQuery(
    "q9u_mad_outliers",
    """WITH src AS (
      |  SELECT c_mktsegment AS seg,
      |         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) // 10000 AS v
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE o_totalprice IS NOT NULL
      |  UNION ALL
      |  SELECT c_mktsegment,
      |         (CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) * 10) // 10000
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE o_orderkey % 97 = 0 AND o_totalprice IS NOT NULL),
      |cells AS (
      |  SELECT seg, v, CAST(COUNT(*) AS BIGINT) AS n FROM src GROUP BY 1, 2),
      |med AS (
      |  SELECT seg, CAST(MIN(CASE WHEN 2*cn >= tn THEN v END) AS BIGINT)
      |           AS median_v
      |  FROM (SELECT seg, v, n,
      |          SUM(n) OVER (PARTITION BY seg ORDER BY v
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
      |          SUM(n) OVER (PARTITION BY seg) AS tn
      |        FROM cells)
      |  GROUP BY 1),
      |dev AS (
      |  SELECT c.seg, ABS(c.v - m.median_v) AS d, CAST(SUM(n) AS BIGINT) AS n
      |  FROM cells c JOIN med m ON c.seg = m.seg
      |  GROUP BY 1, 2),
      |mad AS (
      |  SELECT seg, CAST(MIN(CASE WHEN 2*cn >= tn THEN d END) AS BIGINT)
      |           AS mad_v
      |  FROM (SELECT seg, d, n,
      |          SUM(n) OVER (PARTITION BY seg ORDER BY d
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
      |          SUM(n) OVER (PARTITION BY seg) AS tn
      |        FROM dev)
      |  GROUP BY 1)
      |SELECT c.seg AS segment,
      |       CAST(SUM(c.n) AS BIGINT) AS n_rows,
      |       CAST(MIN(m.median_v) AS BIGINT) AS median_v,
      |       CAST(MIN(a.mad_v) AS BIGINT) AS mad_v,
      |       CAST(SUM(CASE WHEN ABS(c.v - m.median_v) * 10000
      |                       > 44478 * a.mad_v
      |                THEN c.n ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM cells c JOIN med m ON c.seg = m.seg JOIN mad a ON c.seg = a.seg
      |GROUP BY 1""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val t = Tables(spark, dir)
    val joined = t.orders
      .filter($"o_totalprice".isNotNull)
      .join(t.customer, $"o_custkey" === $"c_custkey")
      .select($"c_mktsegment".as("seg"), $"o_orderkey",
        floor($"o_totalprice" * 100 + 0.5).cast("long").as("cents"))
    val src = joined.select($"seg", expr("cents div 10000").as("v"))
      .unionByName(joined.filter($"o_orderkey" % 97 === 0)
        .select($"seg", expr("(cents * 10) div 10000").as("v")))
    val cells = src.groupBy($"seg", $"v").agg(count(lit(1)).as("n"))
    def lowerMedian(df: org.apache.spark.sql.DataFrame, valueCol: String,
        out: String): org.apache.spark.sql.DataFrame = {
      val wc = Window.partitionBy(col("seg")).orderBy(col(valueCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wt = Window.partitionBy(col("seg"))
      df.withColumn("cn", sum(col("n")).over(wc))
        .withColumn("tn", sum(col("n")).over(wt))
        .groupBy(col("seg"))
        .agg(min(when(col("cn") * 2 >= col("tn"), col(valueCol))).as(out))
    }
    val med = lowerMedian(cells, "v", "median_v")
    val dev = cells.join(med, "seg")
      .groupBy($"seg", abs($"v" - $"median_v").as("d"))
      .agg(sum($"n").as("n"))
    val mad = lowerMedian(dev, "d", "mad_v")
    cells.join(med, "seg").join(mad, "seg")
      .groupBy($"seg".as("segment"))
      .agg(sum($"n").as("n_rows"),
        min($"median_v").as("median_v"),
        min($"mad_v").as("mad_v"),
        sum(when(abs($"v" - $"median_v") * 10000 > $"mad_v" * 44478, $"n")
          .otherwise(0L)).as("n_outliers"))
  }

  /** q27b — Holt double exponential smoothing (level + trend) of
    * monthly segment revenue, extending q27's single-EMA recurrence:
    *   l₁ = r₁,  b₁ = r₂ − r₁
    *   lₜ = ¼·rₜ + ¾·(lₜ₋₁ + bₜ₋₁),  bₜ = ½·(lₜ − lₜ₋₁) + ½·bₜ₋₁
    * plus the one-step-ahead forecast lₜ + bₜ — the trend-aware
    * workhorse between q27's flat EMA and full seasonal models. The
    * coefficients ¼/¾/½ are exact binary and both engines evaluate the
    * same expression tree over the same exact-decimal revenue, so the
    * doubly-recursive chain matches bitwise: Spark folds the grouped
    * month array left-to-right carrying (level, trend) in the
    * accumulator's last struct (q27's ordered-fold device), DuckDB
    * steps a recursive CTE carrying the same two columns.
    *
    * Scale: identical budget to q27 — the corpus collapses at the
    * (segment, month) hash agg; the fold runs at segment grain over
    * calendar-bounded arrays. Groups need ≥ 2 months for the trend
    * init; both engines filter on the same HAVING.
    */
  val q27bHoltTrend: GraftQuery = GraftQuery(
    "q27b_holt_trend",
    """WITH RECURSIVE monthly AS (
      |  SELECT c_mktsegment, strftime(o_orderdate, '%Y-%m') AS mon,
      |         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS VARCHAR)
      |           AS DOUBLE) AS rev
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE o_orderdate IS NOT NULL
      |  GROUP BY 1, 2),
      |idx AS (
      |  SELECT c_mktsegment, mon, rev,
      |         ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY mon) AS t
      |  FROM monthly),
      |holt AS (
      |  SELECT i1.c_mktsegment, i1.mon, i1.rev, i1.t,
      |         i1.rev AS lvl, i2.rev - i1.rev AS trend
      |  FROM idx i1 JOIN idx i2
      |    ON i1.c_mktsegment = i2.c_mktsegment AND i1.t = 1 AND i2.t = 2
      |  UNION ALL
      |  SELECT i.c_mktsegment, i.mon, i.rev, i.t,
      |         0.25 * i.rev + 0.75 * (h.lvl + h.trend),
      |         0.5 * ((0.25 * i.rev + 0.75 * (h.lvl + h.trend)) - h.lvl)
      |           + 0.5 * h.trend
      |  FROM idx i JOIN holt h
      |    ON i.c_mktsegment = h.c_mktsegment AND i.t = h.t + 1)
      |SELECT c_mktsegment, mon, rev, lvl, trend,
      |       lvl + trend AS forecast
      |FROM holt""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val t = Tables(spark, dir)
    // Same null contract as q27 (measure-exclusion, r16 `linkedseq`):
    // an undateable order is excluded from the monthly series on both
    // engines before the Holt recurrence. See NULL_CONTRACT.md.
    val monthly = t.orders
      .filter($"o_orderdate".isNotNull)
      .join(t.customer, $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment",
        date_format($"o_orderdate", "yyyy-MM").as("mon"))
      .agg(Exact.dsum($"o_totalprice").as("rev"))
    monthly
      .groupBy($"c_mktsegment")
      .agg(array_sort(collect_list(struct($"mon", $"rev"))).as("arr"))
      .filter(size($"arr") >= 2)
      .select($"c_mktsegment", explode(expr(
        """aggregate(
          |  slice(arr, 2, size(arr) - 1),
          |  array(named_struct(
          |    'mon', element_at(arr, 1).mon,
          |    'rev', element_at(arr, 1).rev,
          |    'lvl', element_at(arr, 1).rev,
          |    'trend', element_at(arr, 2).rev - element_at(arr, 1).rev)),
          |  (acc, x) -> concat(acc, array(named_struct(
          |    'mon', x.mon, 'rev', x.rev,
          |    'lvl', 0.25D * x.rev
          |      + 0.75D * (element_at(acc, -1).lvl + element_at(acc, -1).trend),
          |    'trend', 0.5D * ((0.25D * x.rev
          |        + 0.75D * (element_at(acc, -1).lvl + element_at(acc, -1).trend))
          |        - element_at(acc, -1).lvl)
          |      + 0.5D * element_at(acc, -1).trend))))""".stripMargin))
        .as("h"))
      .select($"c_mktsegment", $"h.mon".as("mon"), $"h.rev".as("rev"),
        $"h.lvl".as("lvl"), $"h.trend".as("trend"),
        ($"h.lvl" + $"h.trend").as("forecast"))
  }

  val all: Seq[GraftQuery] =
    Seq(q20aPivot, q20bCube, q20cDensify, q20dUnpivot, q21TopkPerNation,
      q22IncrementalAgg, q27ExpSmoothing, q27bHoltTrend,
      q20eGapfillInterp, q9qWeightedMedian, q9uMadOutliers)
}
