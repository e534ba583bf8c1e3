package graft.plans

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Geo
import graft.queries.GraftQuery

/** Query surface of the [[GeoRules]] optimizer extension. */
object GeoQueries {

  /** q19 — radius search through the `withinRadiusKm` marker: lines
    * whose customer sits within 500 km of the supplier, counted per
    * nation. The oracle applies the PLAIN haversine predicate — a
    * hash match proves the bbox-strengthened rewrite changes nothing.
    */
  val q19GeoRadius: GraftQuery = GraftQuery(
    "q19_geo_radius",
    s"""SELECT n_name,
       |       COUNT(*) AS n_lines_in_radius
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE ${Geo.haversineSql(
          Geo.demoLatSql("o_custkey"), Geo.demoLngSql("o_custkey"),
          Geo.demoLatSql("l_suppkey"), Geo.demoLngSql("l_suppkey"))} <= 500
       |GROUP BY 1""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    GeoRules.install(spark)
    val t = Tables(spark, dir)
    t.lineitem
      .join(t.orders, $"l_orderkey" === $"o_orderkey")
      .join(t.customer, $"o_custkey" === $"c_custkey")
      .join(broadcast(t.nation), $"c_nationkey" === $"n_nationkey")
      .filter(Geo.withinRadiusKm(
        Geo.demoLat($"o_custkey"), Geo.demoLng($"o_custkey"),
        Geo.demoLat($"l_suppkey"), Geo.demoLng($"l_suppkey"),
        lit(500.0)))
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_lines_in_radius"))
  }

  val all: Seq[GraftQuery] = Seq(q19GeoRadius)
}
