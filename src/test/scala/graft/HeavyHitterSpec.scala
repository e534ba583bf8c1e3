package graft

import org.apache.spark.sql.functions._

import graft.functions.MisraGries
import graft.text.HeavyHitterQueries

/** Misra–Gries sketch properties + the q12v exactness contract. */
class HeavyHitterSpec extends SparkTestBase {

  /** Skewed synthetic stream: three planted heavies over a wide
    * uniform tail — the regime where MG must evict constantly.
    */
  private def skewed = {
    import spark.implicits._
    val heavy = Seq.fill(1000)("A") ++ Seq.fill(500)("B") ++ Seq.fill(200)("C")
    val tail  = (1 to 1500).map(i => s"k$i")
    spark.createDataset(scala.util.Random.shuffle(heavy ++ tail).toSeq).toDF("bg")
  }

  test("MG candidates contain every key above n/(k+1) at any partitioning") {
    import spark.implicits._
    val n  = 1000 + 500 + 200 + 1500
    val k  = HeavyHitterQueries.MgCapacity
    // A (1000), B (500) and C (200) all exceed n/(k+1) ≈ 97
    val guaranteed = Set("A", "B", "C")
    assert(n / (k + 1) < 200, "test setup: C must be guaranteed")
    for (parts <- Seq(1, 3, 8)) {
      val mg = udaf(MisraGries.MgAggregator(k),
        org.apache.spark.sql.Encoders.STRING)
      val cands = skewed.repartition(parts)
        .agg(mg($"bg").as("c")).head.getSeq[String](0).toSet
      assert(cands.size <= k, s"sketch exceeded capacity at parts=$parts")
      assert(guaranteed.subsetOf(cands),
        s"lost a guaranteed heavy key at parts=$parts: $cands")
    }
  }

  test("heavyHitters output is exact and partition-independent") {
    import spark.implicits._
    val brute = skewed.groupBy($"bg").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" * HeavyHitterQueries.PhiInv > lit(3200L))
      .select($"bg").as[String].collect().toSet
    for (parts <- Seq(1, 3, 8)) {
      val out = HeavyHitterQueries
        .heavyHitters(spark, skewed.repartition(parts), $"bg")
        .select($"bigram").as[String].collect().toSet
      assert(out == brute, s"parts=$parts: $out != $brute")
    }
  }

  test("q12v rejects the sub-threshold planted candidate via recount") {
    import spark.implicits._
    val out = HeavyHitterQueries.q12vHeavyHitters.fn(spark, sfDir)
      .select($"bigram").as[String].collect().toSet
    assert(out == Set("__hot_mod2__", "__hot_mod3__"),
      s"expected exactly the two >5% plants, got $out")
  }

  test("q12z count-min sketch replays exactly in plain Scala") {
    import spark.implicits._
    // first-principles recount: same bigram stream, same md5 bucket
    // rule, same grid — built with driver-side collections, no Spark
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"text").as[String].collect()
    val bigrams = texts.toSeq.flatMap { t =>
      val w = t.trim.split("\\s+").toSeq
      w.zip(w.drop(1)).map { case (a, b) => s"$a $b" }
    }
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def bucket(key: String, r: Int): Long =
      java.lang.Long.parseLong(md5hex(s"$r|$key").take(13), 16) %
        HeavyHitterQueries.CmWidth
    val grid = bigrams
      .flatMap(k => (0 until HeavyHitterQueries.CmDepth).map(r =>
        (r, bucket(k, r))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val exact = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = exact.map { case (k, cnt) =>
      val est = (0 until HeavyHitterQueries.CmDepth)
        .map(r => grid((r, bucket(k, r)))).min
      k -> (cnt, est)
    }
    val out = HeavyHitterQueries.q12zCountMin.fn(spark, sfDir)
      .select($"bigram", $"exact_cnt", $"cms_est", $"overcount")
      .as[(String, Long, Long, Long)].collect()
    assert(out.length == expected.size, "row count differs from recount")
    out.foreach { case (k, cnt, est, over) =>
      val (eCnt, eEst) = expected(k)
      assert(cnt == eCnt, s"$k exact: $cnt != $eCnt")
      assert(est == eEst, s"$k estimate: $est != $eEst")
      assert(over == est - cnt && over >= 0, s"$k overcount unsound")
    }
    // the audit must not be vacuous: the 4×256 grid over ~31² keys has
    // real collisions, so SOME estimate strictly exceeds its exact count
    assert(out.exists(_._4 > 0), "no collisions — sketch audit vacuous")
  }

  test("MG merge is order-insensitive on adversarial splits") {
    val agg = MisraGries.MgAggregator(4)
    // reduce a stream sequentially vs in two halves merged either way
    val xs = Seq("a", "b", "c", "d", "e", "a", "a", "b", "f", "a", "g", "b")
    val whole = xs.foldLeft(agg.zero)(agg.reduce)
    val (l, r) = xs.splitAt(5)
    val lb = l.foldLeft(agg.zero)(agg.reduce)
    val rb = r.foldLeft(agg.zero)(agg.reduce)
    val m1 = agg.merge(lb, rb)
    val m2 = agg.merge(rb, lb)
    // sketches need not be identical to the sequential one, but all
    // must respect capacity and keep the dominant key
    for (b <- Seq(whole, m1, m2)) {
      assert(b.size <= 4)
      assert(b.contains("a"), s"dominant key evicted: $b")
    }
    assert(m1.keySet == m2.keySet, "merge must be symmetric in keys")
  }
}
