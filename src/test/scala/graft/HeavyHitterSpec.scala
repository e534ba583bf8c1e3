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
