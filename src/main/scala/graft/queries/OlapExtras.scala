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
      .join(broadcast(t.customer), $"o_custkey" === $"c_custkey")
      .groupBy(year($"o_orderdate").as("o_year"))
      .pivot("c_mktsegment", segments)
      .agg(sum(Exact.revenueExpr($"l_extendedprice", $"l_discount")
        .cast(DecimalType(38, 6))))
      .select($"o_year" +: segments.map(s =>
        Exact.toDouble(coalesce(col(s), lit(0).cast(DecimalType(38, 6))))
          .as(s.toLowerCase)): _*)
  }

  /** q20b — CUBE over (year, returnflag): all four grouping
    * combinations with GROUPING() labels.
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
       |GROUP BY CUBE (year(o_orderdate), l_returnflag)""".stripMargin) {
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
    * per measure. Oracle expresses the melt as UNION ALL.
    */
  val q20dUnpivot: GraftQuery = {
    val measures = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    GraftQuery(
      "q20d_unpivot_measures",
      measures.map(m =>
        s"""SELECT '$m' AS measure, COUNT(*) AS n,
           |  CAST(CAST(SUM(CAST($m AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
           |    AS total
           |FROM lineitem""".stripMargin).mkString("\nUNION ALL\n")) {
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

  val all: Seq[GraftQuery] =
    Seq(q20aPivot, q20bCube, q20cDensify, q20dUnpivot)
}
