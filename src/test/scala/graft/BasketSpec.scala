package graft

import org.apache.spark.sql.functions._

import graft.analytics.BasketQueries

class BasketSpec extends SparkTestBase {

  private lazy val rules =
    BasketQueries.q25BasketRules.fn(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6), r.getDouble(7), r.getBoolean(8))))

  test("pair invariants: keys ordered+unique, counts bounded") {
    assert(rules.nonEmpty)
    assert(rules.map(_._1).distinct.length == rules.length)
    rules.foreach { case ((a, b), (nA, nB, nAb, nBask, conf, lift, _)) =>
      assert(a < b, s"pair ($a, $b) not in canonical order")
      assert(nAb >= 1 && nAb <= math.min(nA, nB),
        s"($a, $b): n_ab=$nAb outside [1, min($nA, $nB)]")
      assert(nA <= nBask && nB <= nBask)
      assert(conf > 0.0 && conf <= 1.0, s"($a, $b): confidence=$conf")
      assert(lift > 0.0)
    }
    assert(rules.map(_._2._4).distinct.length == 1,
      "n_baskets must be one constant across rows")
  }

  test("mining rules are the stated integer cross-multiplications") {
    rules.foreach { case ((a, b), (nA, nB, nAb, nBask, _, _, highLift)) =>
      assert(nAb * 1000 >= 5 * nBask, s"($a, $b) violates the support rule")
      assert(highLift == (nAb * nBask * 100 >= 105 * nA * nB),
        s"($a, $b): high_lift flag disagrees with the integer rule")
    }
  }

  test("pair counts match a brute-force self-join recount") {
    import spark.implicits._
    val t = Tables(spark, sfDir)
    val items = t.lineitem.select($"l_orderkey", $"l_partkey")
      .join(t.part.select($"p_partkey", $"p_brand"),
        $"l_partkey" === $"p_partkey")
      .select($"l_orderkey", $"p_brand").distinct()
    val brute = items.as("a")
      .join(items.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.p_brand") < col("b.p_brand"))
      .groupBy(col("a.p_brand").as("brand_a"), col("b.p_brand").as("brand_b"))
      .agg(count(lit(1)).as("n_ab"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val nBaskets = rules.head._2._4
    // the query's support filter applied to the brute counts
    val expected = brute.filter { case (_, n) => n * 1000 >= 5 * nBaskets }
    assert(rules.map { case (k, v) => k -> v._3 }.toMap == expected)
  }

  test("plan: map-side pair generation — no self-join, dims broadcast") {
    val plan = BasketQueries.q25BasketRules.fn(spark, sfDir)
      .queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("Generate explode"),
      "pairs must come from a map-side array explode")
    assert(plan.contains("BroadcastHashJoin"),
      "frequency/scalar attachments must broadcast")
    assert(!plan.contains("CartesianProduct"),
      "no cartesian product may appear:\n" + plan.take(2000))
  }

  test("q25b: top-3 similar parts match a brute-force driver recount") {
    import spark.implicits._
    val got = BasketQueries.q25bItemSimilarity.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(4)) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // independent recount: baskets → pair counts → cosine → quantized
    // (key desc, id asc) top-3 — entirely in driver Scala
    val items = Tables(spark, sfDir).lineitem
      .select($"l_orderkey", $"l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val freq = items.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairCnt = items.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val directed = pairCnt.toSeq.flatMap { case ((a, b), n) =>
      Seq((a, b, n), (b, a, n)) }
    val want = directed.groupBy(_._1).map { case (a, cands) =>
      val ranked = cands.map { case (_, b, n) =>
        val cos = n.toDouble / math.sqrt((freq(a) * freq(b)).toDouble)
        (math.floor(cos * 1e9 + 0.5).toLong, b, n)
      }.sortBy { case (k, b, _) => (-k, b) }.take(3)
      a -> ranked
    }
    want.foreach { case (a, ranked) =>
      ranked.zipWithIndex.foreach { case ((_, b, n), i) =>
        assert(got((a, i + 1)) == ((b, n)), s"part $a rank ${i + 1}")
      }
    }
    assert(got.size == want.values.map(_.size).sum)
  }
  test("q25c next-item transitions replay from a driver-side recount") {
    import spark.implicits._
    val got = graft.analytics.BasketQueries.q25cNextItem.fn(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(_._4)
    assert(got.nonEmpty && got.map(_._4).toSeq == (1 to got.length))
    // recount: consecutive orders per customer -> part pairs
    val orders = Tables(spark, sfDir).orders
      .select($"o_custkey", $"o_orderkey",
        $"o_orderdate".cast("date").cast("string")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val liByOrder = Tables(spark, sfDir).lineitem
      .select($"l_orderkey", $"l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val trans = scala.collection.mutable.Map
      .empty[(Long, Long), Long].withDefaultValue(0L)
    orders.groupBy(_._1).foreach { case (_, os) =>
      val seqd = os.sortBy(o => (o._3, o._2)).map(_._2)
      seqd.sliding(2).foreach {
        case Array(a, b) =>
          for (pa <- liByOrder.getOrElse(a, Array.empty[Long]);
               pb <- liByOrder.getOrElse(b, Array.empty[Long]))
            trans((pa, pb)) += 1L
        case _ =>
      }
    }
    val expTop = trans.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }
      .take(got.length)
    got.zip(expTop).foreach { case ((gf, gt, gn, _), ((ef, et), en)) =>
      assert(gf == ef && gt == et && gn == en,
        s"transition mismatch: got ($gf,$gt,$gn) expected ($ef,$et,$en)")
    }
  }
}
