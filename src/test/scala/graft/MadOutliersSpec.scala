package graft

/** Pins q9u's null-price exclusion on the `heavyprice` degenerate
  * warehouse (FOUR orders of ONE FURNITURE customer: o_totalprice
  * 100 / NULL / 200 / 300, and order 0 is an o_orderkey%97 whale
  * re-entered at 10× → value cells v = 1, 2, 3, 10 plus a NULL
  * cell). The expectation is hand-derived over the REAL cells only:
  * tn = 4, lower median at cn ≥ 2 → median_v 2; deviations
  * d = 1, 0, 1, 8 → mad_v 1; the whale cell (d = 8 ≥ 5) is the one
  * outlier; n_rows 4. Without the exclusion (mutation m41 — the
  * exact pre-fix state the r15 twin audit exhibited live), the NULL
  * cell rides Spark's nulls-first cumulation (duck, nulls-last,
  * read median 3 / mad 2 / 0 outliers) and n_rows counts 5.
  */
class MadOutliersSpec extends SparkTestBase {

  test("q9u ignores a null-price order in cells, medians, and counts") {
    val dir = DegenerateData.heavypriceDir(spark)
    val rows = graft.queries.OlapExtras.q9uMadOutliers.fn(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toSeq
    assert(rows == Seq(("FURNITURE", 4L, 2L, 1L, 1L)), s"got $rows")
  }
}
