package graft

import org.apache.spark.sql.functions._

import graft.queries.AnalyticalQueries

class AnalyticalQueriesSpec extends SparkTestBase {

  test("every analytical query runs and returns rows") {
    AnalyticalQueries.all.foreach { q =>
      val df = q.fn(spark, sfDir)
      assert(df.count() > 0, s"${q.name} returned no rows")
    }
  }

  test("q1a: yoy growth null for first year of each month") {
    val df = AnalyticalQueries.q1aYoyGrowth.fn(spark, sfDir).cache()
    import spark.implicits._
    val firstYears = df.groupBy($"o_month").agg(min($"o_year").as("y0"))
    val firsts = df.join(firstYears,
      df("o_month") === firstYears("o_month") && df("o_year") === firstYears("y0"))
    assert(firsts.filter($"prev_year_revenue".isNotNull).count() == 0)
    df.unpersist()
  }

  test("q2a: grouping-set totals are consistent") {
    import spark.implicits._
    val df = AnalyticalQueries.q2aGroupingSets.fn(spark, sfDir).cache()
    val grand = df.filter($"row_type" === "GRAND TOTAL")
      .select($"revenue").as[Double].head()
    val years = df.filter($"row_type" === "YEAR TOTAL")
      .agg(sum($"revenue")).as[Double].head()
    assert(math.abs(grand - years) < 1e-3,
      s"grand=$grand != sum(yearTotals)=$years")
    df.unpersist()
  }

  test("q3b: ytd resets per year and is nondecreasing within year") {
    import spark.implicits._
    val df = AnalyticalQueries.q3bMovingAvgYtd.fn(spark, sfDir)
    val bad = df
      .withColumn("y", year($"ship_day"))
      .withColumn("prev",
        lag($"ytd_revenue", 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"y").orderBy($"ship_day")))
      .filter($"prev".isNotNull && $"ytd_revenue" < $"prev")
    assert(bad.count() == 0)
  }

  test("q5a: exactly top-20, sorted by revenue desc") {
    import spark.implicits._
    val rows = AnalyticalQueries.q5aTopLtv.fn(spark, sfDir)
      .select($"ltv_revenue").as[Double].collect()
    assert(rows.length == 20)
    assert(rows.sameElements(rows.sortBy(-_)))
  }

  test("q5b: on-time rate within [0,100]") {
    import spark.implicits._
    val bad = AnalyticalQueries.q5bMonthlyKpis.fn(spark, sfDir)
      .filter($"on_time_rate_pct" < 0 || $"on_time_rate_pct" > 100)
    assert(bad.count() == 0)
  }

  test("q20e: interpolated gaps replay exactly from the observed days") {
    import spark.implicits._
    val rows = graft.queries.OlapExtras.q20eGapfillInterp.fn(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1)
    assert(rows.nonEmpty && rows.exists(_._3),
      "expected at least one gap-filled day at test scale")
    // endpoints are observed (the spine never extrapolates)
    assert(!rows.head._3 && !rows.last._3)
    // replay: linear integer interpolation between observed neighbors
    def day(s: String): Long = java.time.LocalDate.parse(s).toEpochDay
    val observed = rows.filter(!_._3).map(t => (day(t._1), t._2))
    rows.filter(_._3).foreach { case (d, got, _) =>
      val di = day(d)
      val (pd, pv) = observed.filter(_._1 < di).maxBy(_._1)
      val (nd, nv) = observed.filter(_._1 > di).minBy(_._1)
      val want = pv + ((nv - pv) * (di - pd)) / (nd - pd)
      assert(got == want, s"day $d: got $got, expected $want")
    }
    // spine is dense: one row per calendar day in range
    assert(rows.length ==
      (day(rows.last._1) - day(rows.head._1) + 1).toInt)
  }

  test("q9q weighted median replays from a driver-side recount") {
    import spark.implicits._
    val got = graft.queries.OlapExtras.q9qWeightedMedian.fn(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got.nonEmpty)
    val rows = Tables(spark, sfDir).lineitem
      .select($"l_returnflag", $"l_linestatus", $"l_quantity",
        $"l_extendedprice", $"l_discount").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2).toLong,
        math.floor(r.getDouble(3) * (1 - r.getDouble(4)) * 100 + 0.5).toLong))
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val byQty = rs.groupBy(_._2).view.mapValues(_.map(_._3).sum)
        .toSeq.sortBy(_._1)
      val tot = byQty.map(_._2).sum
      var cum = 0L
      val med = byQty.collectFirst {
        case (q, w) if { cum += w; 2 * cum >= tot } => q
      }.get
      assert(got(g) == ((med, tot)), s"group $g: got ${got(g)}, want ($med, $tot)")
    }
  }

  test("q27: EMA recurrence replays exactly from the month sequence") {
    import spark.implicits._
    val rows = graft.queries.OlapExtras.q27ExpSmoothing.fn(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (seg, rs) =>
      val ordered = rs.sortBy(_._2)
      // s1 = r1; st = 0.25*rt + 0.75*st-1, replayed with the identical
      // double arithmetic — must match BITWISE, not approximately
      var ema = ordered.head._3
      assert(ordered.head._4 == ema, s"$seg first month")
      ordered.tail.foreach { case (_, mon, rev, got) =>
        ema = 0.25d * rev + 0.75d * ema
        assert(got == ema, s"$seg $mon recurrence diverged")
      }
      // smoothing must actually smooth: EMA variance below raw variance
      def variance(xs: Seq[Double]) = {
        val m = xs.sum / xs.size
        xs.map(x => (x - m) * (x - m)).sum / xs.size
      }
      if (ordered.length > 12)
        assert(variance(ordered.map(_._4).toSeq) <
          variance(ordered.map(_._3).toSeq), s"$seg not smoothed")
    }
  }

  // SQL-entry parity moved to ParitySpec, which loops the FULL
  // headline set (q1a–q5b) instead of q1a alone.

  test("q9u MAD outliers: driver replay per segment, plants detected") {
    import spark.implicits._
    val got = graft.queries.OlapExtras.q9uMadOutliers.fn(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.nonEmpty)
    // rebuild one segment from raw rows: planted 10x whales, $100
    // units, lower medians, integer outlier rule
    val t = Tables(spark, sfDir)
    val rows = t.orders.join(t.customer, $"o_custkey" === $"c_custkey")
      .select($"c_mktsegment", $"o_orderkey",
        floor($"o_totalprice" * 100 + 0.5).cast("long"))
      .as[(String, Long, Long)].collect()
    val seg = got.keySet.head
    val vs = rows.filter(_._1 == seg).flatMap { case (_, ok, cents) =>
      Seq(cents / 10000) ++
        (if (ok % 97 == 0) Seq(cents * 10 / 10000) else Nil)
    }.sorted
    def lowerMedian(xs: Seq[Long]): Long = {
      val sorted = xs.sorted
      // first value whose doubled 1-based rank reaches the total
      sorted.zipWithIndex.collectFirst {
        case (v, i) if 2 * (i + 1) >= sorted.size => v
      }.get
    }
    val med = lowerMedian(vs.toSeq)
    val mad = lowerMedian(vs.toSeq.map(v => math.abs(v - med)))
    val outliers = vs.count(v => math.abs(v - med) * 10000 > 44478 * mad)
    val (gn, gmed, gmad, gout) = got(seg)
    assert(gn == vs.length && gmed == med && gmad == mad &&
      gout == outliers.toLong,
      s"$seg: got ($gn,$gmed,$gmad,$gout), want " +
        s"(${vs.length},$med,$mad,$outliers)")
    // planted whales guarantee positives in every segment
    got.foreach { case (s, (_, _, _, o)) =>
      assert(o > 0, s"segment $s found no outliers — plants missed")
    }
  }

  test("q27b: Holt level+trend recurrence replays exactly") {
    import spark.implicits._
    val rows = graft.queries.OlapExtras.q27bHoltTrend.fn(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (seg, rs) =>
      val ordered = rs.sortBy(_._2)
      assert(ordered.length >= 2, s"$seg below the trend-init minimum")
      // l1 = r1, b1 = r2 - r1; then the double recurrence with the
      // identical double arithmetic — bitwise, not approximate
      var lvl = ordered(0)._3
      var trend = ordered(1)._3 - ordered(0)._3
      assert(ordered(0)._4 == lvl && ordered(0)._5 == trend,
        s"$seg init row")
      assert(ordered(0)._6 == lvl + trend, s"$seg init forecast")
      ordered.tail.foreach { case (_, mon, rev, gl, gt, gf) =>
        val prevL = lvl
        lvl = 0.25d * rev + 0.75d * (lvl + trend)
        trend = 0.5d * (lvl - prevL) + 0.5d * trend
        assert(gl == lvl && gt == trend && gf == lvl + trend,
          s"$seg $mon recurrence diverged")
      }
      // the forecast must track a deliberately trending series: on the
      // real data just require trend is finite and level stays within
      // the observed revenue envelope scaled by a safety factor
      val revs = ordered.map(_._3)
      assert(ordered.forall(r => r._4.isFinite && r._5.isFinite))
      assert(ordered.forall(r =>
        r._4 <= revs.max * 2 && r._4 >= revs.min / 2 - revs.max))
    }
  }
}
