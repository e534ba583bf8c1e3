package graft

import graft.analytics.BehaviorQueries

class BehaviorSpec extends SparkTestBase {

  private def funnel() =
    BehaviorQueries.q24bEventFunnel.fn(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap

  test("funnel counts are monotone and match an independent recount") {
    import spark.implicits._
    val got = funnel()
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got(1L) >= got(2L) && got(2L) >= got(3L) && got(3L) >= got(4L))
    assert(got(1L) > 0, "test setup: no users entered the funnel")

    // independent recount: greedy min-ts chaining per user in plain Scala
    val ev = Tables(spark, sfDir).events
      .select($"user_id", $"event_type", unix_micros_col($"ts"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val stages = Seq("signup", "view", "click", "purchase")
    val reached = Array.fill(4)(0L)
    ev.groupBy(_._1).foreach { case (_, rows) =>
      var t = Long.MinValue
      var k = 0
      var continue = true
      while (k < 4 && continue) {
        val nxt = rows.filter(r => r._2 == stages(k) && r._3 > t)
        if (nxt.isEmpty) continue = false
        else { t = nxt.map(_._3).min; reached(k) += 1; k += 1 }
      }
    }
    // greedy-min chaining is exactly the query's semantics
    assert(got(1L) == reached(0) && got(2L) == reached(1) &&
      got(3L) == reached(2) && got(4L) == reached(3),
      s"funnel=$got recount=${reached.toSeq}")
  }

  private def unix_micros_col(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.unix_micros(c)

  test("transitions conserve events; START rows count distinct users") {
    import spark.implicits._
    val t = BehaviorQueries.q24cEventTransitions.fn(spark, sfDir)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    val events = Tables(spark, sfDir).events
    val total = events.count()
    val users = events.select($"user_id").distinct().count()
    assert(t.map(_._2).sum == total, "every event appears in exactly one pair")
    assert(t.filter(_._1._1 == "START").map(_._2).sum == users,
      "one START transition per user")
    assert(t.map(_._1).distinct.length == t.length, "pair keys are unique")
  }

  test("cohort matrix: offset 0 equals cohort size, actives bounded") {
    val rows = BehaviorQueries.q24aCohortRetention.fn(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (cm, off, active, size) =>
      assert(off >= 0, s"negative offset in cohort $cm")
      assert(active >= 1 && active <= size,
        s"cohort $cm offset $off: n_active=$active outside [1, $size]")
    }
    rows.groupBy(_._1).foreach { case (cm, rs) =>
      val at0 = rs.filter(_._2 == 0L)
      assert(at0.length == 1, s"cohort $cm missing its offset-0 row")
      assert(at0.head._3 == at0.head._4,
        s"cohort $cm: offset-0 actives ${at0.head._3} != size ${at0.head._4}")
    }
  }

  test("attribution conserves purchases and matches a last-click recount") {
    import spark.implicits._
    val got = BehaviorQueries.q24dAttribution.fn(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set("organic", "click_1h", "click_older"))

    // driver-side recount: latest click ≤ purchase ts per user
    val ev = Tables(spark, sfDir).events
      .select($"user_id", $"event_type", unix_micros_col($"ts"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val clicksByUser = ev.filter(_._2 == "click")
      .groupBy(_._1).map { case (u, rs) => u -> rs.map(_._3).sorted }
    val counts = scala.collection.mutable.Map(
      "organic" -> 0L, "click_1h" -> 0L, "click_older" -> 0L)
    ev.filter(_._2 == "purchase").foreach { case (u, _, ts) =>
      val prior = clicksByUser.get(u).iterator
        .flatMap(_.takeWhile(_ <= ts)).toSeq
      val ch =
        if (prior.isEmpty) "organic"
        else if (ts - prior.max <= 3600000000L) "click_1h"
        else "click_older"
      counts(ch) += 1L
    }
    assert(got == counts.toMap, s"got=$got recount=$counts")
    assert(got.values.sum == ev.count(_._2 == "purchase"))
  }

  test("multitouch credits conserve value exactly and match a recount") {
    import spark.implicits._
    val got = BehaviorQueries.q24hMultitouch.fn(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

    // driver-side recount: equal integer split over 7-day prior clicks
    val ev = Tables(spark, sfDir).events
      .select($"user_id", $"event_type", unix_micros_col($"ts"), $"value",
        $"event_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    val clicksByUser = ev.filter(_._2 == "click")
      .groupBy(_._1).view.mapValues(_.map(_._3)).toMap
    var organicMicros = 0L
    var creditMicros = 0L
    var residualMicros = 0L
    var totalMicros = 0L
    ev.filter(_._2 == "purchase").foreach { case (u, _, ts, v, _) =>
      val vu = math.floor(v * 1e6 + 0.5).toLong
      totalMicros += vu
      val prior = clicksByUser.getOrElse(u, Array.empty[Long])
        .count(c => c <= ts && ts - c <= 604800000000L)
      if (prior == 0) organicMicros += vu
      else {
        val credit = vu / prior
        creditMicros += credit * prior
        residualMicros += vu - credit * prior
      }
    }
    assert(got("organic")._2 == organicMicros)
    assert(got.getOrElse("rounding_residual", (0L, 0L))._2 == residualMicros)
    val clicked = got.getOrElse("click_24h", (0L, 0L))._2 +
      got.getOrElse("click_7d", (0L, 0L))._2
    assert(clicked == creditMicros)
    // conservation: every micro of purchase value is attributed
    assert(got.values.map(_._2).sum == totalMicros,
      "credited micros across all channels must equal total purchase value")
  }

  test("multitouch is exact on a skewed power-user fixture") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{lit, timestamp_micros}
    // r18: the staged frame moved from pair grain to purchase grain —
    // this fixture makes the pair mass quadratic for ONE user (the
    // distribution the r17 verdict flagged) and checks the channel
    // totals against a driver-side recount, including the 24h/7d
    // split and a null-value purchase.
    val base = 1700000000000000L // µs epoch
    val hr = 3600000000L
    val rows = scala.collection.mutable.ArrayBuffer.empty[
      (Long, Long, Long, String, java.lang.Double)]
    var id = 0L
    // power user 1: 300 clicks over ~12 days, 40 purchases
    (0 until 300).foreach { i =>
      id += 1; rows += ((id, base + i * hr, 1L, "click", null))
    }
    (0 until 40).foreach { i =>
      id += 1
      rows += ((id, base + (i * 8 + 3) * hr, 1L, "purchase",
        Double.box(10.0 + i * 0.937)))
    }
    // normal user 2: 2 clicks then a purchase; one click outside 7d
    id += 1; rows += ((id, base - 200 * hr, 2L, "click", null))
    id += 1; rows += ((id, base + 1 * hr, 2L, "click", null))
    id += 1; rows += ((id, base + 2 * hr, 2L, "purchase", Double.box(5.5)))
    // user 2 again: a NULL-value purchase WITH prior clicks (null
    // credit flows through the touch/residual branches)
    id += 1; rows += ((id, base + 3 * hr, 2L, "purchase", null))
    // user 3: organic purchase (no clicks)
    id += 1; rows += ((id, base, 3L, "purchase", Double.box(7.25)))
    val dir = java.nio.file.Files
      .createTempDirectory("q24h_skew_fixture").toString
    rows.toSeq
      .toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros($"ts_us")).drop("ts_us")
      .withColumn("props", lit(null).cast("string"))
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value",
        $"props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = BehaviorQueries.q24hMultitouch.fn(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), if (r.isNullAt(2)) null else Long.box(r.getLong(2))))
      .toMap
    // driver-side recount at channel grain
    val clicks = rows.filter(_._4 == "click")
      .groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    var (n24, c24, n7, c7, nOrg, cOrg, nRes, cRes) =
      (0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)
    var sawNullCredit = false
    rows.filter(_._4 == "purchase").foreach { case (_, ts, u, _, v) =>
      val prior = clicks.getOrElse(u, Seq.empty)
        .filter(c => c <= ts && ts - c <= 604800000000L)
      val k24 = prior.count(c => ts - c <= 86400000000L).toLong
      val k = prior.size.toLong
      if (k == 0) {
        nOrg += 1
        if (v != null) cOrg += math.floor(v * 1e6 + 0.5).toLong
      } else {
        nRes += 1
        n24 += k24; n7 += k - k24
        if (v == null) sawNullCredit = true
        else {
          val vu = math.floor(v * 1e6 + 0.5).toLong
          val credit = vu / k
          c24 += credit * k24; c7 += credit * (k - k24)
          cRes += vu - credit * k
        }
      }
    }
    assert(sawNullCredit, "fixture must exercise a NULL-value purchase")
    assert(got("click_24h") == ((n24, Long.box(c24))))
    assert(got("click_7d") == ((n7, Long.box(c7))))
    assert(got("organic") == ((nOrg, Long.box(cOrg))))
    assert(got("rounding_residual") == ((nRes, Long.box(cRes))))
  }

  test("plan: funnel stage scans push the event_type literal to parquet") {
    val plan = BehaviorQueries.q24bEventFunnel.fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(event_type,signup)"),
      "event_type filter did not reach the parquet scan:\n" + plan.take(2000))
  }

  test("plan: transitions = one window shuffle + one agg shuffle") {
    val plan = BehaviorQueries.q24cEventTransitions.fn(spark, sfDir)
      .queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 2,
      s"expected <=2 shuffles (user window + pair agg), got $exchanges:\n" +
        plan.take(2000))
  }
}
