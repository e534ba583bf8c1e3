package graft

import java.sql.Timestamp

import graft.operators.AsofJoin

class AsofJoinSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof backward: latest-before match, ties inclusive, null before first") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "e1"), // before any right → null
      (1L, ts("2024-01-01 12:00:00"), "e2"), // ties with r2 → r2 (inclusive)
      (1L, ts("2024-01-01 13:30:00"), "e3"), // after r2 → r2
      (2L, ts("2024-01-01 12:00:00"), "e4")  // other key, only r3 visible
    ).toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 11:00:00"), 100L),
      (1L, ts("2024-01-01 12:00:00"), 200L),
      (2L, ts("2024-01-01 11:59:59"), 300L)
    ).toDF("user_id", "ts", "rid")

    val out = AsofJoin.asofBackward(left, right,
      keys = Seq("user_id"), tsCol = "ts", carryCols = Seq("rid"))
      .select($"tag", $"asof_rid").collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

    assert(out("e1").isEmpty, "match before any right row must be null")
    assert(out("e2").contains(200L), "equal timestamps must match (inclusive)")
    assert(out("e3").contains(200L))
    assert(out("e4").contains(300L), "keys must not leak across partitions")
  }

  test("asof forward: earliest-after match, strict at ties, null after last") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "e1"), // before both → r1
      (1L, ts("2024-01-01 11:00:00"), "e2"), // ties with r1 → STRICT → r2
      (1L, ts("2024-01-01 13:00:00"), "e3")  // after last right → null
    ).toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 11:00:00"), 100L),
      (1L, ts("2024-01-01 12:00:00"), 200L)
    ).toDF("user_id", "ts", "rid")

    val out = AsofJoin.asofForward(left, right,
      keys = Seq("user_id"), tsCol = "ts", carryCols = Seq("rid"))
      .select($"tag", $"asof_rid").collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

    assert(out("e1").contains(100L))
    assert(out("e2").contains(200L), "forward must be strict at equal ts")
    assert(out("e3").isEmpty, "match after the last right row must be null")
  }

  /** The NULL-ts contract (r16, object scaladoc): DuckDB's native
    * ASOF can never satisfy its inequality on a NULL timestamp, so
    * (1) NULL-ts RIGHT rows are dropped — without the drop they ride
    * Spark's nulls-first window order to the partition head and
    * become every early left row's backward carry (the q24d live
    * divergence, pinned cross-engine in LinkedSeqSpec / mutation
    * m47); (2) NULL-ts LEFT rows keep their row but carry NULL in
    * EVERY direction — the forward/nearest frames would otherwise
    * grab the first real right row that sorts after them.
    */
  test("null-ts rows: right dropped, left carries null in all directions") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "e1"), // only null-ts click before → null
      (1L, null.asInstanceOf[Timestamp], "e2") // null-ts left → null both ways
    ).toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, null.asInstanceOf[Timestamp], 666L), // must never match
      (1L, ts("2024-01-01 12:00:00"), 200L)
    ).toDF("user_id", "ts", "rid")

    val back = AsofJoin.asofBackward(left, right,
      keys = Seq("user_id"), tsCol = "ts", carryCols = Seq("rid"))
      .select($"tag", $"asof_rid").collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(back("e1").isEmpty, "a null-ts right row must never be a backward carry")
    assert(back("e2").isEmpty, "a null-ts left row carries nothing backward")

    val near = AsofJoin.asofNearest(left, right,
      keys = Seq("user_id"), tsCol = "ts", carryCols = Seq("rid"))
      .select($"tag", $"asof_back_rid", $"asof_fwd_rid").collect()
      .map(r => r.getString(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1))),
          (if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    assert(near("e1") == (None, Some(200L)),
      "real-ts left: forward still sees the real right row")
    assert(near("e2") == (None, None),
      "a null-ts left row must carry null in BOTH directions " +
        "(nulls-first would otherwise hand it the first real forward row)")
  }

  test("dedupRight restores the distinct-(keys, ts) precondition") {
    import spark.implicits._
    // two right rows on the same (user, ts): the raw join's carry is
    // an arbitrary pick; after dedupRight it is the deterministic MIN
    val t0 = ts("2024-01-01 09:00:00")
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "e1"))
      .toDF("user_id", "ts", "tag")
    val dupRight = Seq((1L, t0, 7L), (1L, t0, 3L), (1L, t0, 9L))
      .toDF("user_id", "ts", "rid")
    val deduped = AsofJoin.dedupRight(dupRight,
      keys = Seq("user_id"), tsCol = "ts", carryCols = Seq("rid"))
    assert(deduped.count() === 1L)
    val out = AsofJoin.asofBackward(left, deduped,
      keys = Seq("user_id"), tsCol = "ts", carryCols = Seq("rid"))
      .select($"asof_rid").collect().map(_.getLong(0)).toList
    assert(out === List(3L), "carry must be the deterministic minimum")
    intercept[IllegalArgumentException] {
      AsofJoin.dedupRight(dupRight, Seq("user_id"), "ts", Nil)
    }
  }

  test("asof nearest evaluates both directions in one window stage") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "e1"))
      .toDF("user_id", "ts", "tag")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), 1L))
      .toDF("user_id", "ts", "rid")
    val df = AsofJoin.asofNearest(left, right,
      keys = Seq("user_id"), tsCol = "ts", carryCols = Seq("rid"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val windows = "\\bWindow\\b".r.findAllIn(plan).length
    assert(windows === 1,
      s"both frames must share one WindowExec, found $windows:\n$plan")
  }
}
