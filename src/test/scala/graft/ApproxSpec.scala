package graft

import org.apache.spark.sql.functions._

/** Sketch-based scale alternates: at 100 TB, exact distinct counts
  * and exact percentiles are the expensive path (expand / full sort);
  * HLL and quantile sketches are the drop-in replacements. These
  * tests pin their error against the exact operators so swapping is a
  * measured decision, not a hope.
  */
class ApproxSpec extends SparkTestBase {

  test("approx_count_distinct within 5% of exact") {
    import spark.implicits._
    val li = Tables(spark, sfDir).lineitem
    val row = li.agg(
      countDistinct($"l_orderkey").as("exact"),
      approx_count_distinct($"l_orderkey").as("approx"),
      approx_count_distinct($"l_orderkey", 0.01).as("approx_tight"))
      .head
    val (exact, approx, tight) =
      (row.getLong(0).toDouble, row.getLong(1).toDouble,
        row.getLong(2).toDouble)
    // default rsd = 0.05 → bound at 3×rsd (error is a random variable;
    // observed 6.4% at sf0.001's ~1.5k distinct keys)
    assert(math.abs(approx - exact) / exact < 0.15,
      s"default HLL err ${math.abs(approx - exact) / exact}")
    assert(math.abs(tight - exact) / exact < 0.02,
      s"rsd=0.01 HLL err ${math.abs(tight - exact) / exact}")
  }

  test("percentile_approx close to exact percentile") {
    import spark.implicits._
    val li = Tables(spark, sfDir).lineitem
    val row = li.agg(
      percentile($"l_extendedprice", lit(0.5)).as("exact"),
      percentile_approx($"l_extendedprice", lit(0.5), lit(10000))
        .as("approx"))
      .head
    val (exact, approx) = (row.getDouble(0), row.getDouble(1))
    assert(math.abs(approx - exact) / exact < 0.01,
      s"median approx=$approx exact=$exact")
  }
}
