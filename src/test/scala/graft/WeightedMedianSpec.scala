package graft

/** Pins q9q's null-quantity exclusion on the `heavy` degenerate
  * warehouse (one four-row lineitem group: quantity cells 1/2/3 at
  * 1000¢ weight each plus a NULL-quantity row carrying 10000¢). The
  * expectation is hand-derived from the lower-weighted-median rule
  * over the REAL cells only: tw = 3000, cumulative 1000/2000/3000,
  * first 2·cw ≥ tw at qty 2. Without the exclusion (mutation m40 —
  * the exact pre-fix state the r14 twin audit exhibited), the null
  * cell's 10000¢ rides the cumulative window nulls-first and the
  * pick collapses to qty 1 with tw 13000 over 4 cells, while the
  * DuckDB twin's nulls-last ordering reaches no real cell at all.
  */
class WeightedMedianSpec extends SparkTestBase {

  test("q9q ignores a heavy null-quantity cell in cells, weights, and pick") {
    val dir = DegenerateData.heavyDir(spark)
    val rows = graft.queries.OlapExtras.q9qWeightedMedian.fn(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toSeq
    assert(rows == Seq(("A", "F", 2L, 3000L, 3L)), s"got $rows")
  }
}
