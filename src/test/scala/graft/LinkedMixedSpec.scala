package graft

/** Pins the three fixes the `linkedmixed` fixture exhibited live
  * (r15): heavytie's referential wiring + the mixed shape's
  * middle-row nulls, so dirty VALUES flow through RESOLVED joins.
  * Fixture facts used below (inspected once, deterministic):
  * customers (FURNITURE, NULL, MACHINERY); orders 0/1/2 → customers
  * 0/1/2 with order 1's priority/date/price NULL (order 0 dated
  * 1997-01-15 = base era, order 2 dated 2001-07-11 = current era);
  * lineitem 1's price/discount NULL; nation 1's name NULL.
  *
  * q21 (m44): a NULL-revenue customer group is EXCLUDED from the
  * top-k pick on both engines — without the exclusion the
  * TopKAggregator's (Double, Long) product encoder coerces NULL to
  * 0.0 (the twin carries NULL), and "no revenue data" must never
  * read as "zero revenue".
  *
  * q26c (m45) / q26d (m46): a NULL segment is a REAL group — the
  * engine's window totals keep it; the twins' group-key rejoins are
  * null-safe to match. The mutants drop the NULL-segment group on
  * the engine side (2 rows instead of 3).
  */
class LinkedMixedSpec extends SparkTestBase {

  private lazy val dir = DegenerateData.linkedmixedDir(spark)

  test("q21 excludes the NULL-revenue group from the top-k on both engines") {
    val rows = SparkEntry.queries("q21_topk_per_nation")(spark, dir)
      .collect()
      .map(r => (Option(r.getString(0)), r.getLong(1),
        math.rint(r.getDouble(2) * 10000) / 10000, r.getInt(3)))
      .toSeq.sortBy(_._2)
    assert(rows == Seq(
      (Some("NATION_0"), 0L, 41360.4108, 1),
      (Some("NATION_2"), 2L, 61548.3218, 1)), s"got $rows")
  }

  test("q26c keeps the NULL-segment group (single-category entropy 0)") {
    val rows = SparkEntry.queries("q26c_entropy")(spark, dir)
      .collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
      .toSeq
    assert(rows.length == 3 && rows.exists(_._1.isEmpty),
      s"expected 3 segment groups incl. NULL, got $rows")
    assert(rows.forall(r => r._2 == 1L && r._3 == 1L
      && r._4 == 0.0 && r._5 == 0.0), s"got $rows")
  }

  test("q26d keeps the NULL-segment group (null date lands in the current era)") {
    val rows = SparkEntry.queries("q26d_psi_drift")(spark, dir)
      .collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
      .toSeq
    assert(rows.length == 3, s"expected 3 segment groups, got $rows")
    val nullSeg = rows.find(_._1.isEmpty)
    assert(nullSeg.contains((None, 1L, 0L, 1L, 0.0)), s"got $rows")
  }
}
