package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.GraftQuery
import graft.Staging.Stageable

/** Behavioral analytics extension (q24 family): cohort retention,
  * ordered funnels, and event-transition counts — the three classic
  * user-journey analyses a BI stack layers over an event/orders store
  * (the reference's DAX rolling-active / churn measures stop at
  * per-month actives; these complete the journey toolkit).
  *
  * All three follow the integer-ranking discipline: every output
  * column is a BIGINT count, an integer month-offset, or a label —
  * no float arithmetic, so the DuckDB twin hashes bitwise-identically
  * by construction.
  *
  * At scale: every join/window here is keyed on the entity id
  * (o_custkey / user_id), so the whole family is one co-keyed shuffle
  * per stage over monotonically SHRINKING inputs — cohort assignment
  * is a groupBy(custkey) that reduces to one row per customer before
  * anything joins it; funnel stage k joins only the survivors of
  * stage k-1; transitions is a single user_id window then a
  * 36-key hash-agg with map-side combine.
  */
object BehaviorQueries {

  private def ym(d: Column): Column =
    (year(d) * 12 + month(d)).cast("long")

  /** q24a — cohort retention matrix over orders: customers bucketed
    * by first-order month, activity counted per month offset.
    */
  val q24aCohortRetention: GraftQuery = GraftQuery(
    "q24a_cohort_retention",
    """WITH f AS (
      |  SELECT o_custkey, MIN(o_orderdate) AS fd FROM orders GROUP BY 1),
      |sizes AS (
      |  SELECT strftime(fd, '%Y-%m') AS cohort_month,
      |         COUNT(*) AS cohort_size
      |  FROM f GROUP BY 1),
      |act AS (
      |  SELECT DISTINCT o_custkey,
      |         CAST(year(o_orderdate)*12 + month(o_orderdate) AS BIGINT) AS am
      |  FROM orders),
      |j AS (
      |  SELECT a.o_custkey, strftime(f.fd, '%Y-%m') AS cohort_month,
      |         a.am - CAST(year(f.fd)*12 + month(f.fd) AS BIGINT) AS offset_m
      |  FROM act a JOIN f USING (o_custkey))
      |SELECT j.cohort_month, j.offset_m,
      |       COUNT(DISTINCT j.o_custkey) AS n_active, s.cohort_size
      |FROM j JOIN sizes s ON s.cohort_month = j.cohort_month
      |GROUP BY 1, 2, 4""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val o = Tables(spark, dir).orders.select($"o_custkey", $"o_orderdate")
    val firstOrd = o.groupBy($"o_custkey")
      .agg(min($"o_orderdate").as("fd"))
    val sizes = firstOrd
      .groupBy(date_format($"fd", "yyyy-MM").as("cohort_month"))
      .agg(count(lit(1)).as("cohort_size"))
    val act = o
      .select($"o_custkey", ym($"o_orderdate").as("am"))
      .distinct()
    act.join(firstOrd, "o_custkey")
      .select($"o_custkey",
        date_format($"fd", "yyyy-MM").as("cohort_month"),
        ($"am" - ym($"fd")).as("offset_m"))
      .groupBy($"cohort_month", $"offset_m")
      .agg(countDistinct($"o_custkey").as("n_active"))
      .join(sizes, "cohort_month")
  }

  /** One funnel stage: earliest event of `stage` strictly after the
    * previous stage's timestamp, per user still in the funnel.
    */
  private def nextStage(
      events: DataFrame, prev: DataFrame, stage: String): DataFrame = {
    import events.sparkSession.implicits._
    events.filter($"event_type" === stage)
      .join(prev.select($"user_id", $"t"), "user_id")
      .filter($"ts" > $"t")
      .groupBy($"user_id")
      .agg(min($"ts").as("t"))
  }

  /** The funnel transform over an arbitrary events frame — shared by
    * the batch query q24b and the streaming foreachBatch ingest path
    * (StreamingSpec), so batch and stream can never diverge.
    */
  def funnel(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val ev = events.select($"user_id", $"event_type", $"ts")
    val s1 = ev.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"ts").as("t"))
    val s2 = nextStage(ev, s1, "view")
    val s3 = nextStage(ev, s2, "click")
    val s4 = nextStage(ev, s3, "purchase")
    Seq(("signup", 1L, s1), ("view", 2L, s2),
        ("click", 3L, s3), ("purchase", 4L, s4))
      .map { case (name, id, df) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(id).as("stage_id"), lit(name).as("stage"),
            $"n_users")
      }
      .reduce(_ unionAll _)
  }

  /** q24b — ordered funnel signup → view → click → purchase: a user
    * counts at stage k only with events in strictly increasing time
    * order (min-ts chaining, the standard funnel semantics).
    */
  val q24bEventFunnel: GraftQuery = GraftQuery(
    "q24b_event_funnel",
    """WITH s1 AS (
      |  SELECT user_id, MIN(ts) AS t FROM events
      |  WHERE event_type = 'signup' GROUP BY 1),
      |s2 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s1 USING (user_id)
      |  WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY 1),
      |s3 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s2 USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts > s2.t GROUP BY 1),
      |s4 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s3 USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY 1)
      |SELECT CAST(1 AS BIGINT) AS stage_id, 'signup' AS stage,
      |       COUNT(*) AS n_users FROM s1
      |UNION ALL SELECT 2, 'view', COUNT(*) FROM s2
      |UNION ALL SELECT 3, 'click', COUNT(*) FROM s3
      |UNION ALL SELECT 4, 'purchase', COUNT(*) FROM s4""".stripMargin) {
    (spark, dir) => funnel(Tables(spark, dir).events)
  }

  /** q24c — event-transition counts (first-order Markov structure):
    * per-user LAG over (ts, event_id) — the unique event_id breaks
    * ts ties so the previous-event assignment is deterministic —
    * then a tiny (|types|+1)² hash-agg. An UNDATEABLE event (NULL ts)
    * has no position in a sequence, so both engines exclude it (the
    * q15c convention): unfiltered, Spark's window orders NULLS FIRST
    * and DuckDB's NULLS LAST, assigning the dirty row a different
    * neighbor on each engine (degenerate-dir twin audit — flushed by
    * the outlier fixture's mixed null/non-null user).
    */
  val q24cEventTransitions: GraftQuery = GraftQuery(
    "q24c_event_transitions",
    """WITH lagged AS (
      |  SELECT COALESCE(lag(event_type) OVER w, 'START') AS prev_type,
      |         event_type
      |  FROM events
      |  WHERE ts IS NOT NULL
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT prev_type, event_type, COUNT(*) AS n
      |FROM lagged GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables(spark, dir).events
      .filter($"ts".isNotNull)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("prev_type",
        coalesce(lag($"event_type", 1).over(w), lit("START")))
      .groupBy($"prev_type", $"event_type")
      .agg(count(lit(1)).as("n"))
  }

  /** q24d — last-touch attribution: each purchase attributed to the
    * user's most recent preceding click via [[graft.operators.AsofJoin
    * .asofBackward]] (clicks deduped to (user, ts) grain first — the
    * operator's documented precondition), then bucketed by click
    * recency: within 1 h / older / organic (no prior click). Revenue
    * per channel uses the exact-decimal sum, so the 3-row rollup
    * hash-matches DuckDB's native ASOF twin bitwise. Scale shape: one
    * (user, ts) shuffle + sort for the as-of carry, then a 3-key
    * hash-agg with map-side combine.
    */
  val q24dAttribution: GraftQuery = GraftQuery(
    "q24d_attribution",
    """WITH p AS (
      |  SELECT user_id, ts, value FROM events
      |  WHERE event_type = 'purchase'),
      |c AS (
      |  SELECT user_id, ts, MIN(event_id) AS click_id FROM events
      |  WHERE event_type = 'click' GROUP BY 1, 2),
      |a AS (
      |  SELECT p.value, c.click_id,
      |         epoch_us(p.ts) - epoch_us(c.ts) AS age_us
      |  FROM p ASOF LEFT JOIN c
      |    ON p.user_id = c.user_id AND c.ts <= p.ts)
      |SELECT CASE WHEN click_id IS NULL THEN 'organic'
      |            WHEN age_us <= 3600000000 THEN 'click_1h'
      |            ELSE 'click_older' END AS channel,
      |       COUNT(*) AS n_purchases,
      |       CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS VARCHAR)
      |            AS DOUBLE) AS revenue
      |FROM a GROUP BY 1""".stripMargin) { (spark, dir) =>
    attribution(Tables(spark, dir).events)
  }

  /** The last-touch-attribution transform over an arbitrary events
    * frame — shared by the batch query q24d and the streaming
    * foreachBatch ingest path (StreamingSpec).
    */
  def attribution(ev: DataFrame): DataFrame = {
    import ev.sparkSession.implicits._
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"value")
    val clicks = ev.filter($"event_type" === "click")
      .groupBy($"user_id", $"ts")
      .agg(min($"event_id").as("click_id"))
      .withColumn("cus", unix_micros($"ts"))
    graft.operators.AsofJoin
      .asofBackward(purchases, clicks, keys = Seq("user_id"),
        tsCol = "ts", carryCols = Seq("click_id", "cus"))
      .withColumn("age_us", unix_micros($"ts") - $"asof_cus")
      .withColumn("channel",
        when($"asof_click_id".isNull, "organic")
          .when($"age_us" <= 3600000000L, "click_1h")
          .otherwise("click_older"))
      .groupBy($"channel")
      .agg(count(lit(1)).as("n_purchases"),
        graft.functions.Exact.dsum($"value").as("revenue"))
  }

  /** q24h — multi-touch (linear) attribution: every click in the 7
    * days before a purchase shares the purchase's value equally; the
    * remainder of the integer split goes to "organic", as does the
    * full value of purchases with no qualifying click. Completes the
    * attribution pair with q24d's last-touch.
    *
    * Determinism: value → integer MICROS once (⌊v·1e6+½⌋ — identical
    * IEEE double math both engines), then credit = micros DIV n_clicks
    * (integer division, order-free) and remainder = micros − n·credit;
    * every downstream SUM is a BIGINT sum. No float division anywhere.
    *
    * Scale shape: purchases⋈clicks is a USER-keyed equi-join (one
    * shuffle each side, co-partitioned) with the 7-day band as a
    * post-join filter — per-user click counts are bounded in any real
    * event store, so the pair blowup is per-user quadratic only in a
    * 7-day window, the same budget the interval join q15e runs on.
    * Then two hash-aggs (purchase grain → recency-bucket grain) with
    * map-side combine.
    */
  val q24hMultitouch: GraftQuery = GraftQuery(
    "q24h_multitouch",
    """WITH p AS (
      |  SELECT user_id, ts,
      |         CAST(floor(value*1e6 + 0.5) AS BIGINT) AS vu,
      |         event_id AS pid
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (
      |  SELECT user_id, ts FROM events WHERE event_type = 'click'),
      |j AS (
      |  SELECT p.pid, p.vu, p.ts AS pts, c.ts AS cts
      |  FROM p JOIN c ON p.user_id = c.user_id
      |  WHERE c.ts <= p.ts
      |    AND epoch_us(p.ts) - epoch_us(c.ts) <= 604800000000),
      |per_p AS (
      |  SELECT pid, vu, COUNT(*) AS n_clicks,
      |         vu // COUNT(*) AS credit
      |  FROM j GROUP BY pid, vu),
      |touch AS (
      |  SELECT j.pid,
      |         CASE WHEN epoch_us(j.pts) - epoch_us(j.cts) <= 86400000000
      |              THEN 'click_24h' ELSE 'click_7d' END AS channel,
      |         pp.credit
      |  FROM j JOIN per_p pp ON pp.pid = j.pid),
      |organic AS (
      |  SELECT 'organic' AS channel,
      |         COUNT(*) AS n_touches,
      |         CAST(SUM(p.vu) AS BIGINT) AS credited_micros
      |  FROM p WHERE pid NOT IN (SELECT pid FROM per_p)),
      |remainder AS (
      |  SELECT 'rounding_residual' AS channel,
      |         COUNT(*) AS n_touches,
      |         CAST(SUM(vu - n_clicks * credit) AS BIGINT)
      |           AS credited_micros
      |  FROM per_p)
      |SELECT channel, n_touches, credited_micros FROM (
      |  SELECT channel, COUNT(*) AS n_touches,
      |         CAST(SUM(credit) AS BIGINT) AS credited_micros
      |  FROM touch GROUP BY channel
      |  UNION ALL SELECT * FROM organic
      |  UNION ALL SELECT * FROM remainder)""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val ev = Tables(spark, dir).events
    // Staging grain (r18, replacing r17's pair-grain `j` checkpoint):
    // the per-channel touch totals need only PER-PURCHASE counts —
    // n_touches(click_24h) = Σ_p n_24h(p) and its credit sum =
    // Σ_p n_24h(p)·credit(p) (identical integers to the old pair-
    // grain COUNT(*)/SUM(credit) by distributivity) — so the band
    // join's pair mass collapses to purchase grain via map-side
    // partial aggregation INSIDE the join stage and is never
    // materialized: the r17 verdict's skew concern (the one staged
    // frame whose size was quadratic in per-user event rate) is gone
    // by construction — the staged frame is now bounded by the
    // purchase count regardless of click distribution, and the join
    // itself is an ordinary user-keyed equi-join AQE's skew-split
    // can handle. perP is staged ONCE via eager localCheckpoint (the
    // q12y/q13j device): three union branches consume it and their
    // differently-pruned subtrees would otherwise re-run the band
    // join per branch (9 events scans / 19 exchanges in the r17
    // baseline plan).
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts",
        floor($"value" * 1e6 + 0.5).cast("long").as("vu"),
        $"event_id".as("pid"))
    val c = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts".as("cts"))
    val perP = p.join(c, "user_id")
      .filter($"cts" <= $"ts" &&
        unix_micros($"ts") - unix_micros($"cts") <= 604800000000L)
      .groupBy($"pid", $"vu")
      .agg(count(lit(1)).as("n_clicks"),
        sum(when(unix_micros($"ts") - unix_micros($"cts")
          <= 86400000000L, 1L).otherwise(0L)).as("n_24h"))
      .withColumn("credit", expr("vu div n_clicks"))
      .staged
    // one pass over the staged grain emits both channel rows; a
    // channel with zero touches must NOT emit (the old pair-grain
    // groupBy(channel) produced no group for it)
    val touch = perP.select(explode(array(
        struct(lit("click_24h").as("channel"), $"n_24h".as("n"),
          ($"n_24h" * $"credit").as("cr")),
        struct(lit("click_7d").as("channel"),
          ($"n_clicks" - $"n_24h").as("n"),
          (($"n_clicks" - $"n_24h") * $"credit").as("cr")))).as("t"))
      .groupBy($"t.channel".as("channel"))
      .agg(sum($"t.n").as("n_touches"),
        sum($"t.cr").as("credited_micros"))
      .filter($"n_touches" > 0)
    val organic = p.join(perP.select($"pid"), Seq("pid"), "left_anti")
      .agg(count(lit(1)).as("n_touches"),
        sum($"vu").as("credited_micros"))
      .select(lit("organic").as("channel"), $"n_touches",
        $"credited_micros")
    val residual = perP
      .agg(count(lit(1)).as("n_touches"),
        sum($"vu" - $"n_clicks" * $"credit").as("credited_micros"))
      .select(lit("rounding_residual").as("channel"), $"n_touches",
        $"credited_micros")
    touch.unionByName(organic).unionByName(residual)
  }

  val all: Seq[GraftQuery] =
    Seq(q24aCohortRetention, q24bEventFunnel, q24cEventTransitions,
      q24dAttribution, q24hMultitouch)
}
