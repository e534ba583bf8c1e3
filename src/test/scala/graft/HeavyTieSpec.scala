package graft

/** Pins the two fixes the `heavytie` linked dirty star exhibited live
  * (r15): a referentially-intact 3-row warehouse where every nation
  * has exactly one customer/order/lineitem at IDENTICAL revenue 1000
  * (an exact 3-way tie) and nation 1's n_name is NULL.
  *
  * q9f (mutation m42): the revenue-rank tiebreak must pin NULLS LAST
  * — hand-derived ranks NATION_0=1, NATION_2=2, NULL=3 (the mutant's
  * Spark default asc=nulls-first reads NULL=1, NATION_0=2,
  * NATION_2=3 while the DuckDB twin keeps nulls last).
  *
  * q9o (mutation m43): the NULL-name nation is a REAL group — three
  * output rows with n=1 and p50=1000 each; the mutant's plain
  * equi-join rejoin drops the NULL group's rows on the Spark side
  * only (2 rows) while the twin's direct GROUP BY emits 3.
  */
class HeavyTieSpec extends SparkTestBase {

  test("q9f ranks a tied NULL-name nation last on both engines") {
    val dir = DegenerateData.heavytieDir(spark)
    val rows = SparkEntry.queries("q9f_revenue_share")(spark, dir)
      .collect()
      .map(r => (Option(r.getString(0)), r.getDouble(1), r.getInt(5)))
      .sortBy(_._3)
      .toSeq
    assert(rows == Seq(
      (Some("NATION_0"), 1000.0, 1),
      (Some("NATION_2"), 1000.0, 2),
      (None, 1000.0, 3)), s"got $rows")
  }

  test("q9o keeps the NULL-name nation group through the stats rejoin") {
    val dir = DegenerateData.heavytieDir(spark)
    val rows = SparkEntry.queries("q9o_grouped_quantiles")(spark, dir)
      .collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getDouble(3),
        r.getBoolean(6)))
      .toSeq.sortBy(_._1.getOrElse("~"))
    assert(rows == Seq(
      (Some("NATION_0"), 1L, 1000.0, true),
      (Some("NATION_2"), 1L, 1000.0, true),
      (None, 1L, 1000.0, true)), s"got $rows")
  }
}
