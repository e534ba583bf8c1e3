package graft

/** Pins the fixes the `linkedseq` linked dirty star exhibited live
  * (r16): a referentially-intact warehouse where ONE customer
  * (custkey 0, FURNITURE) holds FOUR orders — dates 1996-01-01 /
  * NULL / 1996-03-01 / 1996-05-01 with prices 100/200/400/800 — and
  * ONE user (7) holds four events: a NULL-ts click, a 10:00 purchase
  * (value 20), a 12:00 click, and a 12:30 purchase (value 40) — the
  * last pair an EXACT 30-min gap.
  *
  * Every expectation below is hand-derived from that construction,
  * engine-independent; the DuckDB twins replay the same fixture in
  * tools/audit_degenerate.sh linkedseq.
  *
  * q24d + AsofJoin (mutation m47): a NULL-ts click can never be an
  * as-of match (DuckDB-native semantics) — the 10:00 purchase is
  * 'organic'; the mutant's unfiltered interleave carries the null-ts
  * click nulls-first and reads 'click_older'.
  *
  * q25c (mutation m48): the undateable order is excluded from the
  * next-item sequence on both engines — transitions are exactly
  * part 0→2 and 2→3; the mutant ranks the NULL date first (Spark)
  * vs last (DuckDB) and shifts every pair.
  *
  * q27/q27b (mutation m49): the undateable order has no month — the
  * FURNITURE EMA chain is 100, 175, 331.25 (¼/¾ over 100/400/800);
  * the mutant's NULL-mon bucket sorts FIRST inside array_sort's
  * struct ordering and seeds the chain with 200.
  *
  * q15c/q15d boundary (mutation m50): an event landing EXACTLY gap
  * after the previous one CONTINUES the session (Spark session_window
  * merges on touch; the islands twins use strict >) — user 7 has two
  * sessions, {10:00} and {12:00, 12:30}.
  */
class LinkedSeqSpec extends SparkTestBase {

  private lazy val dir = DegenerateData.linkedseqDir(spark)

  test("q24d: a NULL-ts click never attributes; the 12:00 click lands click_1h") {
    val rows = SparkEntry.queries("q24d_attribution")(spark, dir)
      .collect()
      .map(r => (r.getAs[String]("channel"), r.getAs[Long]("n_purchases"),
        r.getAs[Double]("revenue")))
      .toSeq.sortBy(_._1)
    assert(rows == Seq(("click_1h", 1L, 40.0), ("organic", 1L, 20.0)),
      s"got $rows")
  }

  test("q25c: the undateable order is outside the next-item sequence") {
    val rows = SparkEntry.queries("q25c_next_item")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("part_from"), r.getAs[Long]("part_to"),
        r.getAs[Long]("n"), r.getAs[Int]("rank")))
      .toSeq.sortBy(_._4)
    assert(rows == Seq((0L, 2L, 1L, 1), (2L, 3L, 1L, 2)), s"got $rows")
  }

  test("q27: the EMA chain is seeded by the first DATED month") {
    val rows = SparkEntry.queries("q27_exp_smoothing")(spark, dir)
      .collect()
      .map(r => (r.getAs[String]("mon"), r.getAs[Double]("rev"),
        r.getAs[Double]("ema")))
      .toSeq.sortBy(_._1)
    assert(rows == Seq(
      ("1996-01", 100.0, 100.0),
      ("1996-03", 400.0, 175.0),
      ("1996-05", 800.0, 331.25)), s"got $rows")
  }

  test("q27b: the Holt level/trend chain starts at the first DATED month pair") {
    val rows = SparkEntry.queries("q27b_holt_trend")(spark, dir)
      .collect()
      .map(r => (r.getAs[String]("mon"), r.getAs[Double]("rev"),
        r.getAs[Double]("lvl"), r.getAs[Double]("trend"),
        r.getAs[Double]("forecast")))
      .toSeq.sortBy(_._1)
    assert(rows == Seq(
      ("1996-01", 100.0, 100.0, 300.0, 400.0),
      ("1996-03", 400.0, 400.0, 300.0, 700.0),
      ("1996-05", 800.0, 725.0, 312.5, 1037.5)), s"got $rows")
  }

  test("q15d: an exact-gap event MERGES into the previous session (touch-inclusive)") {
    val rows = SparkEntry.queries("q15d_session_window")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start_us"),
        r.getAs[Long]("session_end_us"), r.getAs[Long]("n_events")))
      .toSeq.sortBy(_._2)
    assert(rows == Seq(
      (7L, 823168800000000L, 823170600000000L, 1L),
      (7L, 823176000000000L, 823179600000000L, 2L)), s"got $rows")
  }

  test("q15c: the exact-gap pair is ONE island (strict > gap test)") {
    val rows = SparkEntry.queries("q15c_sessionization")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_sessions"),
        r.getAs[Long]("n_events"), r.getAs[Double]("avg_session_secs")))
      .toSeq
    assert(rows == Seq((7L, 2L, 3L, 900.0)), s"got $rows")
  }
}
