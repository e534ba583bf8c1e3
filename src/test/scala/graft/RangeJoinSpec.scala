package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** The bucketized proximity join vs a literal brute-force theta-join
  * on the same data — every qualifying pair exactly once, boundary
  * rows (|dt| == tol) included, non-matching left rows preserved.
  */
class RangeJoinSpec extends SparkTestBase {

  test("proximity join ≡ brute-force band join, exact multiset incl. nulls") {
    import spark.implicits._
    // tol = 10: pairs straddle bin edges (9→[0..19) vs 10,19,20),
    // exact-boundary distances (|dt| = 10), and an isolated left row.
    val left = Seq(1L -> 0L, 2L -> 9L, 3L -> 100L, 4L -> 995L)
      .toDF("lid", "l_us")
    val right = Seq(10L, 19L, 20L, 110L, 90L, 500L).toDF("r_us")

    // EXACT multiset — .toSet would mask duplicate null-padded rows,
    // the defect the right-side-explode formulation eliminates.
    val got = RangeJoin
      .proximityJoinUs(left, right, "l_us", "r_us", tolUs = 10L, payload = Nil)
      .select($"lid", $"r_us")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .sorted(Ordering.Tuple2(Ordering.Long, Ordering.Option[Long]))
      .toList

    val pairs = left.crossJoin(right)
      .filter(abs($"l_us" - $"r_us") <= 10L)
      .select($"lid", $"r_us")
      .collect()
      .map(r => (r.getLong(0), Option(r.getLong(1))))
      .toList
    val matchedLids = pairs.map(_._1).toSet
    val expected = (pairs ++
      left.collect().map(_.getLong(0))
        .filterNot(matchedLids).map(lid => (lid, None: Option[Long])))
      .sorted(Ordering.Tuple2(Ordering.Long, Ordering.Option[Long]))
    assert(got === expected,
      "left-outer multiset must be exact: one row per pair, " +
        "one null row per unmatched left row, nothing else")
    assert(got.contains((4L, None)), "unmatched left row must be kept")
  }

  /** The NULL-ts pin (r16, recorded alongside AsofJoin's contract
    * fix): the bin EQUI-join is null-symmetric by construction — a
    * null-ts right row matches nothing (like the three-valued
    * `ABS(l − NULL) <= tol`), a null-ts left row survives as exactly
    * one null-padded row. See the proximityJoinUs scaladoc.
    */
  test("null timestamps: right rows match nothing, left rows survive null-padded") {
    import spark.implicits._
    val left = Seq(
      (1L, Option(100L)),
      (2L, Option.empty[Long]) // null-ts left: one null-padded row
    ).toDF("lid", "l_us")
    val right = Seq(Option(105L), Option.empty[Long]) // null-ts right: never a match
      .toDF("r_us")
    val got = RangeJoin
      .proximityJoinUs(left, right, "l_us", "r_us", tolUs = 10L, payload = Nil)
      .select($"lid", $"r_us")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .sorted(Ordering.Tuple2(Ordering.Long, Ordering.Option[Long]))
      .toList
    assert(got === List((1L, Some(105L)), (2L, None)),
      s"got $got — a null-ts row leaked into the band (or a left row vanished)")
  }

  test("q23 plans an equi-join on the bin — never a nested-loop scan") {
    val df = graft.operators.RangeJoin.q23ProximityJoin.fn(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"keyless band join fell back to nested-loop:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"keyless band join fell back to cartesian:\n$plan")
  }
}
