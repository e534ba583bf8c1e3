package graft

import org.apache.spark.sql.functions._

import graft.functions.Geo
import graft.plans.GeoRules

class GeoSpec extends SparkTestBase {

  private def coords() = {
    import spark.implicits._
    Tables(spark, sfDir).lineitem
      .join(Tables(spark, sfDir).orders, $"l_orderkey" === $"o_orderkey")
      .select(
        Geo.demoLat($"o_custkey").as("lat1"),
        Geo.demoLng($"o_custkey").as("lng1"),
        Geo.demoLat($"l_suppkey").as("lat2"),
        Geo.demoLng($"l_suppkey").as("lng2"),
        $"l_orderkey", $"l_linenumber")
  }

  test("withinRadiusKm rewrite preserves the naive haversine result") {
    import spark.implicits._
    GeoRules.install(spark)
    val df = coords()
    val viaMarker = df.filter(Geo.withinRadiusKm(
      $"lat1", $"lng1", $"lat2", $"lng2", lit(800.0)))
      .select($"l_orderkey", $"l_linenumber")
    val naive = df.filter(
      Geo.haversineKm($"lat1", $"lng1", $"lat2", $"lng2") <= 800.0)
      .select($"l_orderkey", $"l_linenumber")
    assert(viaMarker.exceptAll(naive).count() == 0 &&
      naive.exceptAll(viaMarker).count() == 0)
    assert(viaMarker.count() > 0, "radius filter selected nothing")
  }

  test("optimizer expands the marker into bbox AND exact haversine") {
    import spark.implicits._
    GeoRules.install(spark)
    val df = coords().filter(Geo.withinRadiusKm(
      $"lat1", $"lng1", $"lat2", $"lng2", lit(500.0)))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("WithinRadiusKm"),
      s"marker survived optimization:\n$optimized")
    assert(optimized.contains("abs("),
      s"no bounding-box prefilter in plan:\n$optimized")
    assert(optimized.toLowerCase.contains("sin("),
      s"exact haversine missing from plan:\n$optimized")
  }

  test("bbox bound is necessary: no point inside radius is outside bbox") {
    import spark.implicits._
    val df = coords()
      .withColumn("dist",
        Geo.haversineKm($"lat1", $"lng1", $"lat2", $"lng2"))
      .withColumn("bbox_pass",
        abs($"lat1" - $"lat2") <= lit(700.0) / Geo.KmPerDegLat)
    val violating = df.filter($"dist" <= 700.0 && !$"bbox_pass")
    assert(violating.count() == 0)
  }
}
