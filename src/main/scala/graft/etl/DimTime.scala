package graft.etl

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.functions.Calendar
import graft.queries.GraftQuery

/** dim_time generator — the reference's `ETL/ETL for time.ktr`
  * (RowGenerator + JS putRow loop, `:568-670`; calendar attrs JS
  * `:817-960`; holiday computus `:682-815`) re-expressed as a single
  * declarative plan: `explode(sequence(...))` is Spark's built-in
  * Generator, every attribute a codegen'd Column expression, holidays
  * an `isin` literal list (no UDF, no join).
  *
  * `time_key` is the reference's dense per-day sequence
  * (SURVEY §1.3): datediff from the range start + 1 — deterministic
  * and collision-free without a window or a driver loop, so at any
  * scale it's a pure map.
  */
object DimTime {

  val DefaultStart: LocalDate = LocalDate.of(2016, 1, 1)
  val DefaultEnd: LocalDate   = LocalDate.of(2020, 12, 31)

  def build(spark: SparkSession,
            start: LocalDate = DefaultStart,
            end: LocalDate = DefaultEnd): DataFrame = {
    import spark.implicits._
    val d = to_date(lit(start.toString))
    val days = spark.range(1)
      .select(explode(sequence(d, to_date(lit(end.toString)),
        expr("interval 1 day"))).as("d"))
    days.select(
      (datediff($"d", d) + 1).cast("int").as("time_key"),
      $"d".cast(StringType).as("date"),
      dayofmonth($"d").as("day"),
      // ISO day-of-week 1=Mon..7=Sun (Spark weekday() is 0=Mon)
      (weekday($"d") + 1).as("day_of_week"),
      date_format($"d", "EEEE").as("day_name"),
      weekofyear($"d").as("week_of_year"),
      month($"d").as("month"),
      date_format($"d", "MMMM").as("month_name"),
      quarter($"d").as("quarter"),
      year($"d").as("year"),
      Calendar.isHolidayCol($"d", start.getYear, end.getYear).as("is_holiday"),
      Calendar.seasonCol(month($"d")).as("season"))
  }

  /** Oracle twin recomputes Easter INDEPENDENTLY in SQL (same
    * Meeus/Jones/Butcher arithmetic, DuckDB lateral column aliases) —
    * the Scala computus is additionally property-tested against
    * published Easter dates in CalendarSpec.
    */
  val query: GraftQuery = GraftQuery(
    "q6_dim_time",
    """WITH days AS (
      |  SELECT CAST(d AS DATE) AS d
      |  FROM generate_series(DATE '2016-01-01', DATE '2020-12-31',
      |                       INTERVAL 1 DAY) t(d)),
      |e AS (
      |  SELECT y, a, b, c, dd, ee, f, g, h, i, k, l, m,
      |         make_date(CAST(y AS INT),
      |                   CAST((h + l - 7*m + 114) // 31 AS INT),
      |                   CAST((h + l - 7*m + 114) % 31 + 1 AS INT)) AS easter
      |  FROM (
      |    SELECT y, y % 19 AS a, y // 100 AS b, y % 100 AS c,
      |           (y // 100) // 4 AS dd, (y // 100) % 4 AS ee,
      |           ((y // 100) + 8) // 25 AS f,
      |           ((y // 100) - (((y // 100) + 8) // 25) + 1) // 3 AS g,
      |           (19*(y % 19) + (y // 100) - ((y // 100) // 4)
      |             - (((y // 100) - (((y // 100) + 8) // 25) + 1) // 3) + 15) % 30 AS h,
      |           (y % 100) // 4 AS i, (y % 100) % 4 AS k,
      |           (32 + 2*((y // 100) % 4) + 2*((y % 100) // 4) - h - ((y % 100) % 4)) % 7 AS l,
      |           ((y % 19) + 11*h + 22*l) // 451 AS m
      |    FROM (SELECT DISTINCT year(d) AS y FROM days))),
      |hol AS (
      |  SELECT easter - 2 AS h FROM e
      |  UNION ALL
      |  SELECT make_date(CAST(e.y AS INT), fx.m, fx.dd)
      |  FROM e, (VALUES (1,1),(4,21),(5,1),(9,7),(10,12),
      |                  (11,2),(11,15),(12,25)) fx(m,dd)
      |  UNION ALL
      |  SELECT make_date(CAST(y AS INT), 11, 20) FROM e WHERE y >= 2024)
      |SELECT CAST(datediff('day', DATE '2016-01-01', d) + 1 AS INTEGER) AS time_key,
      |       CAST(d AS VARCHAR) AS date,
      |       CAST(day(d) AS INTEGER) AS day,
      |       CAST(isodow(d) AS INTEGER) AS day_of_week,
      |       dayname(d) AS day_name,
      |       CAST(week(d) AS INTEGER) AS week_of_year,
      |       CAST(month(d) AS INTEGER) AS month,
      |       monthname(d) AS month_name,
      |       CAST(quarter(d) AS INTEGER) AS quarter,
      |       CAST(year(d) AS INTEGER) AS year,
      |       d IN (SELECT h FROM hol) AS is_holiday,
      |       CASE WHEN month(d) IN (12,1,2) THEN 'Summer'
      |            WHEN month(d) IN (3,4,5) THEN 'Autumn'
      |            WHEN month(d) IN (6,7,8) THEN 'Winter'
      |            ELSE 'Spring' END AS season
      |FROM days""".stripMargin) { (spark, _) => build(spark) }
}
