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
      .head()
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
      .head()
    val (exact, approx) = (row.getDouble(0), row.getDouble(1))
    assert(math.abs(approx - exact) / exact < 0.01,
      s"median approx=$approx exact=$exact")
  }

  test("q9a approx twin matches the exact describe() within sketch error") {
    import spark.implicits._
    val exact = graft.analytics.AnalyticsQueries.q9aDescriptiveStats
      .fn(spark, sfDir).select($"measure", $"p25", $"median", $"p75")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    // the registered q9a approx query outputs rank-interval verdicts
    // (so it can oracle-gate); the VALUE-level error bound against the
    // exact twin is pinned here on the same sketch call
    val li = Tables(spark, sfDir).lineitem
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax").foreach { m =>
      val r = li.agg(
        percentile_approx(col(m), lit(0.25), lit(10000)).as("p25"),
        percentile_approx(col(m), lit(0.5), lit(10000)).as("p50"),
        percentile_approx(col(m), lit(0.75), lit(10000)).as("p75")).head()
      val (e25, e50, e75) = exact(m)
      Seq((r.getDouble(0), e25), (r.getDouble(1), e50),
        (r.getDouble(2), e75)).foreach { case (a, e) =>
        assert(math.abs(a - e) <= math.max(0.01 * math.abs(e), 1e-9),
          s"$m: approx=$a exact=$e")
      }
    }
    // and every rank-interval verdict in the registered query is true
    val verdicts = graft.analytics.AnalyticsQueries.q9aApproxDescriptiveStats
      .fn(spark, sfDir)
      .select($"measure", $"p25_ok", $"median_ok", $"p75_ok").collect()
    assert(verdicts.length == 4)
    verdicts.foreach { r =>
      assert(r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3),
        s"${r.getString(0)}: a sketch left its rank guarantee")
    }
  }

  test("q9d approx segmentation: Window-free plan, bounded cutpoint error") {
    import spark.implicits._
    val df = graft.analytics.AnalyticsQueries.q9dApproxSegmentation
      .fn(spark, sfDir)
    // the whole point of the scale path: no global-sort Window operator
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "approx segmentation must not contain a Window operator")
    val rows = df.collect()
    // full 3×3-ish matrix, every customer in exactly one cell
    val t = Tables(spark, sfDir)
    val nCust = t.lineitem
      .join(t.orders, $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey").distinct().count()
    assert(rows.map(_.getLong(2)).sum == nCust)
    assert(rows.forall(r => r.getInt(0) >= 1 && r.getInt(0) <= 3 &&
      r.getInt(1) >= 1 && r.getInt(1) <= 3))
    // value tertiles come from near-unique spend: sizes ≈ n/3 (sketch
    // rank error ≤ n/10000 + threshold-boundary ties)
    val byValue = rows.groupBy(_.getInt(0)).view
      .mapValues(_.map(_.getLong(2)).sum)
    (1 to 3).foreach { tile =>
      val n = byValue.getOrElse(tile, 0L).toDouble
      assert(math.abs(n - nCust / 3.0) <= math.max(0.05 * nCust, 3),
        s"value tertile $tile holds $n of $nCust")
    }
  }

  test("q9o grouped quantiles: ordered, in-range, sketches in guarantee") {
    import spark.implicits._
    val rows = graft.analytics.AnalyticsQueries.q9oGroupedQuantiles
      .fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p25, p50, p75) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(p25 <= p50 && p50 <= p75,
        s"${r.getString(0)}: quartiles out of order ($p25, $p50, $p75)")
      assert(r.getBoolean(5) && r.getBoolean(6) && r.getBoolean(7),
        s"${r.getString(0)}: a grouped sketch left its rank guarantee")
    }
  }

  test("q9s A/B readout: counts recount, z² replays, planted lift flags") {
    import spark.implicits._
    val got = graft.analytics.AnalyticsQueries.q9sAbTest.fn(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getBoolean(6)))).toMap
    assert(got.keySet == Set("organic_urgent", "planted_lift"))
    // driver recount of the planted experiment's integer inputs
    val rows = Tables(spark, sfDir).orders
      .select($"o_custkey", $"o_orderkey").as[(Long, Long)].collect()
    val (na, ca, nb, cb) = rows.foldLeft((0L, 0L, 0L, 0L)) {
      case ((a, c1, b, c2), (cust, ord)) =>
        if (cust % 2 == 0) (a + 1, c1 + (if (ord % 8 == 0) 1 else 0), b, c2)
        else (a, c1, b + 1, c2 + (if (ord % 4 == 0) 1 else 0))
    }
    val (gna, gca, gnb, gcb, gz, gsig) = got("planted_lift")
    assert((gna, gca, gnb, gcb) == ((na, ca, nb, cb)), "counts drifted")
    // z² replayed with the same double expression
    val (pa, pb) = (ca.toDouble / na, cb.toDouble / nb)
    val p = (ca + cb).toDouble / (na + nb)
    val z2 = (pa - pb) * (pa - pb) / (p * (1 - p) * (1.0 / na + 1.0 / nb))
    assert(gz == math.floor(z2 * 1e6 + 0.5).toLong, "z² quantum differs")
    // the ~2x designed lift must be flagged at every gate scale
    assert(gsig, s"planted lift not significant (z2_q6=$gz)")
    assert(got("organic_urgent")._5 >= 0)
  }

  test("q9t gains table replays exactly from the planted scorer") {
    import spark.implicits._
    val got = graft.analytics.MlQueries.q9tGainsTable.fn(spark, sfDir)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(got.keySet == (1 to 10).toSet)
    // driver replay: same planted scores, exact NTILE split semantics
    // (first n%10 deciles take the extra row)
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val scored = Tables(spark, sfDir).customer
      .select($"c_custkey").as[Long].collect().map { k =>
        val m52 = java.lang.Long.parseLong(md5hex(s"$k|roc").take(13), 16)
        val pos = k % 3 == 0
        (k, m52 % 1000 + (if (pos) 250L else 0L), if (pos) 1L else 0L)
      }.sortBy { case (k, sc, _) => (-sc, k) }
    val n = scored.length
    val (q, rem) = (n / 10, n % 10)
    val sizes = (1 to 10).map(d => if (d <= rem) q + 1 else q)
    val offsets = sizes.scanLeft(0)(_ + _)
    val tp = scored.map(_._3).sum
    var cum = 0L
    (1 to 10).foreach { d =>
      val slice = scored.slice(offsets(d - 1), offsets(d))
      val resp = slice.map(_._3).sum
      cum += resp
      val (gn, gr, gbps, gcum, glift) = got(d)
      assert(gn == slice.length && gr == resp, s"decile $d counts")
      assert(gbps == resp * 10000 / slice.length, s"decile $d resp_bps")
      assert(gcum == cum * 10000 / tp, s"decile $d capture")
      assert(glift ==
        (BigInt(resp) * n * 10000 / (BigInt(slice.length) * tp)).toLong,
        s"decile $d lift")
    }
    // the planted scorer is informative: top decile must over-index;
    // the last decile's cumulative capture closes at exactly 100%
    assert(got(1)._5 > 10000L, "top-decile lift not above average")
    assert(got(10)._4 == 10000L, "capture does not close at 100%")
  }

  test("q9r Kaplan-Meier matches a plain-Scala replay and its axioms") {
    import spark.implicits._
    val got = graft.analytics.AnalyticsQueries.q9rSurvivalKm.fn(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.nonEmpty)
    // first-principles: rebuild durations, censoring, risk sets and
    // the integer survival recursion from the raw orders
    val o = Tables(spark, sfDir).orders
      .select($"o_custkey", to_date($"o_orderdate").cast("string"))
      .as[(Long, String)].collect()
      .map { case (c, d) => (c, java.time.LocalDate.parse(d)) }
    val end = o.map(_._2).max
    val durs = o.groupBy(_._1).values.map { rows =>
      val f = rows.map(_._2).min
      val l = rows.map(_._2).max
      val churned = java.time.temporal.ChronoUnit.DAYS.between(l, end) > 90
      val dur =
        if (churned) java.time.temporal.ChronoUnit.DAYS.between(f, l)
        else java.time.temporal.ChronoUnit.DAYS.between(f, end)
      (dur, churned)
    }.toSeq
    val total = durs.size.toLong
    val events = durs.filter(_._2).groupBy(_._1).view
      .mapValues(_.size.toLong).toSeq.sortBy(_._1)
    var s = 1000000000L
    val expected = events.map { case (t, d) =>
      val nRisk = durs.count(_._1 >= t).toLong
      s = s * (nRisk - d) / nRisk
      (t, nRisk, d, s)
    }
    assert(got.toSeq == expected,
      s"KM curve differs from replay: got ${got.take(3).toSeq}… " +
        s"want ${expected.take(3)}…")
    // estimator axioms: survival non-increasing in (0, 1e9]; risk sets
    // non-increasing; event counts positive and bounded by risk
    got.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._4 <= a._4 && b._2 <= a._2)
      case _ =>
    }
    got.foreach { case (_, n, d, sv) =>
      assert(d >= 1 && d <= n && sv > 0 && sv <= 1000000000L)
    }
    assert(total >= got.map(_._3).sum, "more events than customers")
  }
}
