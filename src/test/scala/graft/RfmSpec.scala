package graft

import org.apache.spark.sql.functions._

import graft.analytics.RfmQueries

/** First-principles driver recount of the q28 RFM segmentation: the
  * whole pipeline (metrics → exact-split quartiles → rollup) rebuilt
  * in plain Scala from the collected orders table and compared cell
  * by cell — independent of both the Spark plan and the DuckDB twin.
  */
class RfmSpec extends SparkTestBase {

  /** Exact SQL NTILE split: with N rows and n tiles, the first
    * N mod n tiles carry one extra row; input already totally ordered.
    */
  private def ntile(sorted: Seq[Long], n: Int): Map[Long, Int] = {
    val N = sorted.size
    val q = N / n
    val r = N % n
    sorted.zipWithIndex.map { case (id, i) =>
      // tile t (0-based) starts at t*q + min(t, r)
      val t = (0 until n).indexWhere { t =>
        val start = t * q + math.min(t, r)
        val end = (t + 1) * q + math.min(t + 1, r)
        i >= start && i < end
      }
      id -> (t + 1)
    }.toMap
  }

  test("q28 matches a plain-Scala RFM rebuild") {
    import spark.implicits._
    val rows = Tables(spark, sfDir).orders
      .select($"o_custkey", $"o_orderdate".cast("date").cast("string"),
        $"o_totalprice")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val maxDate = rows.map(_._2).max
    def days(d: String): Long =
      java.time.LocalDate.parse(d).toEpochDay
    val byCust = rows.groupBy(_._1).map { case (ck, os) =>
      val recency = days(maxDate) - os.map(o => days(o._2)).max
      val freq = os.size.toLong
      val cents = os.map(o => math.floor(o._3 * 100 + 0.5).toLong).sum
      (ck, recency, freq, cents)
    }.toSeq
    val rq = ntile(byCust.sortBy(c => (c._2, c._1)).map(_._1), 4)
    val fq = ntile(byCust.sortBy(c => (-c._3, c._1)).map(_._1), 4)
    val mq = ntile(byCust.sortBy(c => (-c._4, c._1)).map(_._1), 4)
    val expected = byCust
      .groupBy(c => (rq(c._1), fq(c._1), mq(c._1)))
      .map { case (k, cs) =>
        k -> (cs.size.toLong, cs.map(_._3).sum, cs.map(_._4).sum)
      }

    val got = RfmQueries.q28RfmSegments.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt,
        r.getLong(2).toInt) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got.keySet == expected.keySet,
      s"segment cells differ: spark-only=${got.keySet -- expected.keySet} " +
        s"recount-only=${expected.keySet -- got.keySet}")
    expected.foreach { case (cell, exp) =>
      assert(got(cell) == exp, s"cell $cell: spark=${got(cell)} recount=$exp")
    }
    // every customer lands in exactly one cell
    assert(got.values.map(_._1).sum == byCust.size.toLong)
  }
  test("q28b ABC classes partition the parts and conserve revenue") {
    import spark.implicits._
    val out = graft.analytics.RfmQueries.q28bAbcClassification
      .fn(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val li = Tables(spark, sfDir).lineitem
      .select($"l_partkey", $"l_extendedprice", $"l_discount").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val byPart = li.groupBy(_._1).map { case (_, xs) =>
      xs.map(x => math.floor(x._2 * (1 - x._3) * 100 + 0.5).toLong).sum
    }.toSeq
    val total = byPart.sum
    assert(out.values.map(_._1).sum == byPart.size.toLong,
      "classes must partition the part set")
    assert(out.values.map(_._2).sum == total,
      "classes must conserve total revenue cents")
    // A-class parts carry more revenue per part than B, B more than C
    def avg(c: String): Double =
      out.get(c).map(v => v._2.toDouble / v._1).getOrElse(0.0)
    if (out.contains("A") && out.contains("B")) assert(avg("A") > avg("B"))
    if (out.contains("B") && out.contains("C")) assert(avg("B") > avg("C"))
    // shares in basis points sum to ~10000 (integer floor per class)
    val bpsSum = out.values.map(_._3).sum
    assert(bpsSum >= 10000 - out.size && bpsSum <= 10000,
      s"share_bps sum $bpsSum out of tolerance")
  }
}
