package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Exact
import graft.queries.GraftQuery

/** Streaming extension over the `events` table (SURVEY §2.11 — the
  * reference is batch-only, so this is the engine's Structured
  * Streaming surface, not parity work). The SAME transform functions
  * serve batch DataFrames (oracle-checked below) and streaming
  * DataFrames (driven with watermark + AvailableNow in
  * StreamingSpec): `window()` / `session_window()` are
  * batch-streaming agnostic, which is exactly the Spark-first design.
  *
  * At scale: tumbling/sliding aggregation is a hash-agg keyed on
  * (window, type) — state size bounded by watermark horizon;
  * sessionization is gaps-and-islands (batch) / session_window +
  * watermark (streaming), both shuffle once on user_id.
  */
object EventKpis {

  /** Tumbling 1-hour KPIs — shared by batch + streaming paths.
    * `exactDistinct=false` swaps countDistinct for the sketch-based
    * approx (exact distinct is unsupported in streaming mode).
    */
  def tumblingKpis(events: DataFrame, exactDistinct: Boolean): DataFrame = {
    import events.sparkSession.implicits._
    val distinctUsers =
      if (exactDistinct) countDistinct($"user_id")
      else approx_count_distinct($"user_id")
    events
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n_events"),
        Exact.dsum($"value").as("total_value"),
        distinctUsers.as("n_users"))
      .select($"window.start".cast("string").as("window_start"),
        $"event_type", $"n_events", $"total_value", $"n_users")
  }

  /** Sliding 1-hour window, 30-minute slide. */
  def slidingKpis(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .groupBy(window($"ts", "1 hour", "30 minutes"), $"event_type")
      .agg(count(lit(1)).as("n_events"),
        Exact.dsum($"value").as("total_value"))
      .select($"window.start".cast("string").as("window_start"),
        $"event_type", $"n_events", $"total_value")
  }

  val q15aTumbling: GraftQuery = GraftQuery(
    "q15a_event_kpis_tumbling",
    """SELECT CAST(time_bucket(INTERVAL 1 HOUR, ts) AS VARCHAR) AS window_start,
      |       event_type, COUNT(*) AS n_events,
      |       CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
      |         AS total_value,
      |       COUNT(DISTINCT user_id) AS n_users
      |FROM events WHERE ts IS NOT NULL GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
    tumblingKpis(Tables(spark, dir).events, exactDistinct = true)
  }

  val q15bSliding: GraftQuery = GraftQuery(
    "q15b_event_kpis_sliding",
    """WITH expanded AS (
      |  SELECT CAST(time_bucket(INTERVAL 30 MINUTE, ts)
      |              - k.off * INTERVAL 30 MINUTE AS VARCHAR) AS window_start,
      |         event_type, value
      |  FROM events CROSS JOIN (VALUES (0), (1)) k(off)
      |  WHERE ts IS NOT NULL)
      |SELECT window_start, event_type, COUNT(*) AS n_events,
      |       CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
      |         AS total_value
      |FROM expanded GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
    slidingKpis(Tables(spark, dir).events)
  }

  /** q15c — sessionization, batch twin (gaps-and-islands, 30-min gap):
    * per user session count, events, and mean session duration. The
    * streaming equivalent (session_window + watermark) is exercised
    * in StreamingSpec against this result.
    */
  val q15cSessionization: GraftQuery = GraftQuery(
    "q15c_sessionization",
    """WITH marked AS (
      |  SELECT user_id, ts, event_id,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |               OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WHERE ts IS NOT NULL
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessions AS (
      |  SELECT user_id, ts,
      |         SUM(new_session) OVER (PARTITION BY user_id
      |           ORDER BY ts, event_id
      |           ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM marked),
      |stats AS (
      |  SELECT user_id, session_id, COUNT(*) AS n_events,
      |         epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS dur_us
      |  FROM sessions GROUP BY 1, 2)
      |SELECT user_id, COUNT(*) AS n_sessions,
      |       CAST(SUM(n_events) AS BIGINT) AS n_events,
      |       CAST(SUM(dur_us) AS DOUBLE) / COUNT(*) / 1e6
      |         AS avg_session_secs
      |FROM stats GROUP BY 1""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    // an undateable event cannot be sessionized — NULL ts is excluded
    // on BOTH engines (the q15a/b/d convention). Unfiltered, the two
    // engines DIVERGE on a mixed feed: Spark's window orders NULLS
    // FIRST (the NULL row becomes its own leading session), DuckDB's
    // NULLS LAST (it joins the final session) — different n_sessions
    // for the same data (degenerate-dir twin audit class, SURVEY
    // §8.9; the all-NULL fixture is accidentally symmetric, only a
    // MIXED feed exposes the ordering asymmetry).
    val events = Tables(spark, dir).events.filter($"ts".isNotNull)
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val usec = (c: org.apache.spark.sql.Column) =>
      unix_micros(c)
    val marked = events.withColumn("new_session",
      when(lag($"ts", 1).over(w).isNull ||
        usec($"ts") - usec(lag($"ts", 1).over(w)) > 1800000000L, 1)
        .otherwise(0))
    val sessions = marked.withColumn("session_id",
      sum($"new_session").over(
        Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
          .rowsBetween(Window.unboundedPreceding, 0)))
    val stats = sessions.groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
        (usec(max($"ts")) - usec(min($"ts"))).as("dur_us"))
    stats.groupBy($"user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum($"n_events").as("n_events"),
        (sum($"dur_us").cast("double") / count(lit(1)) / 1e6)
          .as("avg_session_secs"))
  }

  /** q15d — session_window() (the built-in merging session operator,
    * batch+streaming): 30-min-gap sessions per user with micros-exact
    * bounds. Oracle replicates the merge with gaps-and-islands:
    * start = min(ts), end = max(ts) + gap. The boundary test is
    * STRICT `>`: session_window merges an event landing exactly AT
    * the previous session's end (touch-inclusive merge — verified
    * empirically on the r16 `linkedseq` fixture's exact-30-min pair:
    * 12:00 and 12:30 land in ONE session ending 13:00), so a new
    * island opens only when the gap strictly exceeds 30 min. The
    * original `>=` twin encoded the opposite claim and was invisible
    * to sf0.01's micros-grain timestamps (an exact-gap pair never
    * occurs there) — the same islands definition as q15c, which was
    * strict all along. NULL-ts events are dropped by session_window
    * natively; the twin's WHERE mirrors it (NULL_CONTRACT.md).
    * Boundary pinned by LinkedSeqSpec + mutation m50 (engine-side
    * sibling on q15c's strict gap).
    */
  val q15dSessionWindow: GraftQuery = GraftQuery(
    "q15d_session_window",
    """WITH marked AS (
      |  SELECT user_id, ts, event_id,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |               OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WHERE ts IS NOT NULL
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessions AS (
      |  SELECT user_id, ts,
      |         SUM(new_session) OVER (PARTITION BY user_id
      |           ORDER BY ts, event_id
      |           ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM marked)
      |SELECT user_id,
      |       epoch_us(MIN(ts)) AS session_start_us,
      |       epoch_us(MAX(ts)) + 1800000000 AS session_end_us,
      |       COUNT(*) AS n_events
      |FROM sessions GROUP BY user_id, session_id""".stripMargin) {
    (spark, dir) =>
      import spark.implicits._
      Tables(spark, dir).events
        .groupBy(session_window($"ts", "30 minutes"), $"user_id")
        .agg(count(lit(1)).as("n_events"))
        .select($"user_id",
          unix_micros($"session_window.start").as("session_start_us"),
          unix_micros($"session_window.end").as("session_end_us"),
          $"n_events")
  }

  /** Interval join shared by batch and streaming: errors within
    * 10 minutes AFTER a click by the same user. Both time bounds are
    * in the condition, so the same transform is a valid watermarked
    * stream-stream join (state expires past the interval).
    */
  def clickErrorJoin(clicks: DataFrame, errors: DataFrame): DataFrame = {
    import clicks.sparkSession.implicits._
    clicks.alias("c").join(errors.alias("e"),
      $"c.user_id" === $"e.user_id" &&
        $"e.ts" >= $"c.ts" && $"e.ts" <= $"c.ts" + expr("interval 10 minutes"))
      .select($"c.user_id".as("user_id"),
        $"c.event_id".as("click_id"), $"e.event_id".as("error_id"))
  }

  /** q15e — interval-join batch twin: errors-after-click pairs per
    * user. The streaming run of the same transform is in StreamingSpec.
    */
  val q15eIntervalJoin: GraftQuery = GraftQuery(
    "q15e_interval_join",
    """SELECT c.user_id, COUNT(*) AS n_pairs,
      |       COUNT(DISTINCT c.event_id) AS n_clicks_with_error
      |FROM events c
      |JOIN events e ON c.user_id = e.user_id
      | AND c.event_type = 'click' AND e.event_type = 'error'
      | AND e.ts >= c.ts AND e.ts <= c.ts + INTERVAL 10 MINUTE
      |GROUP BY 1""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val ev = Tables(spark, dir).events
    clickErrorJoin(
      ev.filter($"event_type" === "click"),
      ev.filter($"event_type" === "error"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct($"click_id").as("n_clicks_with_error"))
  }

  /** Planted at-least-once delivery: every event_id % 13 == 0 arrives
    * AGAIN 5 minutes late — the raw table is exactly-once (event_id is
    * unique), and an ingest-dedup operator needs positives. Shared by
    * the batch twin and the streaming spec so both paths see the same
    * duplicate stream.
    */
  def plantedRedelivery(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events.unionByName(events.filter($"event_id" % 13 === 0)
      .withColumn("ts", $"ts" + expr("INTERVAL 5 MINUTES")))
  }

  /** Streaming ingest dedup: first delivery wins, duplicate state
    * expires with the watermark (bounded state — the whole point at
    * 100 TB/day ingest; an unwatermarked dropDuplicates would grow
    * state forever). Driven in StreamingSpec; the audit-table batch
    * twin below is the oracle-gated surface.
    */
  def streamDedup(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** q15g — ingest-dedup audit (batch twin): per event_id the
    * delivery count and the winning (earliest) delivery's fields.
    * min(ts) is the deterministic "first delivery wins" rule;
    * event_type/value are delivery-invariant so min() selects the
    * same payload both engines. One hash aggregation keyed on
    * event_id — linear, skew-free (planted dup factor is 2).
    */
  val q15gStreamDedup: GraftQuery = GraftQuery(
    "q15g_stream_dedup",
    """WITH planted AS (
      |  SELECT event_id, ts, user_id, event_type, value FROM events
      |  UNION ALL
      |  SELECT event_id, ts + INTERVAL 5 MINUTE, user_id, event_type, value
      |  FROM events WHERE event_id % 13 = 0)
      |SELECT event_id, COUNT(*) AS n_deliveries,
      |       epoch_us(MIN(ts)) AS first_ts_us,
      |       MIN(event_type) AS event_type,
      |       MIN(value) AS value
      |FROM planted GROUP BY 1""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    plantedRedelivery(Tables(spark, dir).events)
      .groupBy($"event_id")
      .agg(count(lit(1)).as("n_deliveries"),
        unix_micros(min($"ts")).as("first_ts_us"),
        min($"event_type").as("event_type"),
        min($"value").as("value"))
  }

  /** Left-outer interval join: every click, matched to the errors in
    * its 10-minute aftermath OR kept with a NULL error — the "did this
    * click lead to trouble" probe where unmatched clicks ARE the
    * signal. Shared by the batch twin q15i and the streaming parity
    * test: in Structured Streaming this exact shape (equi-key + event-
    * time range + watermarks both sides) is the supported outer
    * stream-stream join — the watermark bounds how long a click waits
    * for its NULL verdict, which is the state-cleanup contract at
    * scale.
    */
  def clickErrorLeftJoin(clicks: DataFrame, errors: DataFrame): DataFrame = {
    import clicks.sparkSession.implicits._
    clicks.alias("c").join(errors.alias("e"),
      $"c.user_id" === $"e.user_id" &&
        $"e.ts" >= $"c.ts" && $"e.ts" <= $"c.ts" + expr("interval 10 minutes"),
      "left_outer")
      .select($"c.user_id".as("user_id"),
        $"c.event_id".as("click_id"), $"e.event_id".as("error_id"))
  }

  /** q15i — left-outer interval-join batch twin: per user, clicks with
    * and without a trailing error (matched pair rows + NULL-error
    * clicks), the outer complement of q15e.
    */
  val q15iIntervalLeftJoin: GraftQuery = GraftQuery(
    "q15i_interval_left_join",
    """SELECT c.user_id,
      |       COUNT(*) AS n_rows,
      |       COUNT(e.event_id) AS n_matched,
      |       COUNT(DISTINCT c.event_id)
      |         - COUNT(DISTINCT CASE WHEN e.event_id IS NOT NULL
      |                               THEN c.event_id END)
      |         AS n_clean_clicks
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
      |  ON c.user_id = e.user_id
      | AND e.ts >= c.ts AND e.ts <= c.ts + INTERVAL 10 MINUTE
      |GROUP BY 1""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val ev = Tables(spark, dir).events
    clickErrorLeftJoin(
      ev.filter($"event_type" === "click"),
      ev.filter($"event_type" === "error"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_rows"),
        count($"error_id").as("n_matched"),
        (countDistinct($"click_id") -
          countDistinct(when($"error_id".isNotNull, $"click_id")))
          .as("n_clean_clicks"))
  }

  val all: Seq[GraftQuery] = Seq(q15aTumbling, q15bSliding,
    q15cSessionization, q15dSessionWindow, q15eIntervalJoin,
    q15gStreamDedup, q15iIntervalLeftJoin)
}
