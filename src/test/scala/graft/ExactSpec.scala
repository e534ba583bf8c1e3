package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{Exact, VectorOps}

/** Properties of the cross-engine-deterministic numeric core. */
class ExactSpec extends SparkTestBase {

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("dsum is order-independent and close to the naive sum") {
    import spark.implicits._
    val lists = sample(Gen.listOfN(200,
      Gen.chooseNum(-1e6, 1e6).map(v => math.rint(v * 100) / 100)), 10)
    lists.foreach { xs =>
      val a = xs.toDF("x").agg(Exact.dsum($"x")).head.getDouble(0)
      val b = scala.util.Random.shuffle(xs).toDF("x")
        .repartition(7).agg(Exact.dsum($"x")).head.getDouble(0)
      assert(a == b, "dsum differed across orderings/partitionings")
      // 2dp inputs sum exactly: the decimal path must equal BigDecimal
      val exact = xs.map(BigDecimal(_)).sum.toDouble
      assert(math.abs(a - exact) < 1e-6, s"dsum=$a exact=$exact")
    }
  }

  test("dstddev matches two-pass stddev on well-conditioned data") {
    import spark.implicits._
    val xs = sample(Gen.chooseNum(0.0, 1000.0)
      .map(v => math.rint(v * 100) / 100), 1).head
    val data = sample(Gen.listOfN(500,
      Gen.chooseNum(0.0, 1000.0).map(v => math.rint(v * 100) / 100)), 5)
    data.foreach { vs =>
      val spark_ = vs.toDF("x").agg(Exact.dstddev($"x")).head.getDouble(0)
      val mean = vs.sum / vs.length
      val twoPass = math.sqrt(
        vs.map(v => (v - mean) * (v - mean)).sum / (vs.length - 1))
      assert(math.abs(spark_ - twoPass) / twoPass < 1e-9,
        s"dstddev=$spark_ twoPass=$twoPass")
    }
  }

  test("VectorOps cosine: bounded, symmetric, self-similarity 1") {
    import spark.implicits._
    val vecs = sample(Gen.listOfN(16,
      Gen.chooseNum(-1.0f, 1.0f)), 20).map(_.toArray).zipWithIndex
    val df = vecs.map { case (v, i) => (i.toLong, v) }.toDF("id", "emb")
    val a = df.toDF("ida", "emba")
    val b = df.toDF("idb", "embb")
    val cos = a.join(b, $"ida" <= $"idb")
      .select($"ida", $"idb",
        VectorOps.cosineFrom(VectorOps.dot($"emba", $"embb"),
          VectorOps.norm2($"emba"), VectorOps.norm2($"embb")).as("c"))
      .collect()
    cos.foreach { r =>
      val c = r.getDouble(2)
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
      if (r.getLong(0) == r.getLong(1))
        assert(math.abs(c - 1.0) < 1e-9, s"self-cosine $c != 1")
    }
    // symmetry: dot(a,b) must equal dot(b,a) exactly (same fold order
    // over zip_with pairs)
    val sym = a.join(b, $"ida" < $"idb")
      .select((VectorOps.dot($"emba", $"embb") -
        VectorOps.dot($"embb", $"emba")).as("d"))
      .filter(abs($"d") > 0.0)
    assert(sym.count() == 0)
  }
}
