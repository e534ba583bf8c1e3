package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.etl.Scd

/** SCD2 interval invariants (SURVEY §5 iii) over generated snapshot
  * histories: per natural key the rebuilt intervals must tile
  * [first_snap, 2099-12-31) with no gaps/overlaps, exactly one open
  * row, version dense from 1, and consecutive versions must differ in
  * the tracked attribute.
  */
class ScdSpec extends SparkTestBase {

  private val histories: Gen[List[(Int, String, Int)]] = for {
    nKeys  <- Gen.choose(1, 6)
    nSnaps <- Gen.choose(1, 8)
    vals   <- Gen.listOfN(nKeys * nSnaps, Gen.choose(0, 3))
  } yield {
    val snaps = (1 to nSnaps).map(i => f"2020-$i%02d-01")
    (for {
      k <- 0 until nKeys
      (s, i) <- snaps.zipWithIndex
    } yield (k, s, vals(k * nSnaps + i))).toList
  }

  test("scd2Rebuild invariants hold on generated histories") {
    import spark.implicits._
    // draw 20 deterministic samples (no scalatestplus bridge offline)
    val samples = (1 to 20).flatMap(i =>
      histories.apply(Gen.Parameters.default, Seed(i.toLong)))
    samples.foreach { rows =>
      val snaps = rows.toDF("k", "snap", "v")
      val out = Scd.scd2Rebuild(snaps, Seq("k"), Seq("v"), "snap")
        .select($"k", $"v", $"version", $"effective_from", $"effective_to")
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2),
          r.getString(3), r.getString(4)))
        .groupBy(_._1)

      out.foreach { case (k, vs) =>
        val sorted = vs.sortBy(_._3)
        // versions dense from 1
        assert(sorted.map(_._3).toSeq == (1 to sorted.length), s"key $k")
        // exactly one open row
        assert(sorted.count(_._5 == Scd.OpenEnd) == 1, s"key $k open rows")
        // intervals chain: effective_to(n) == effective_from(n+1)
        sorted.sliding(2).foreach {
          case Array(a, b) =>
            assert(a._5 == b._4, s"key $k gap/overlap: ${a._5} vs ${b._4}")
            // consecutive versions differ in tracked attr
            assert(a._2 != b._2, s"key $k: consecutive equal values kept")
          case _ =>
        }
      }
    }
  }

  test("scd1Upsert: incoming wins, inserts appear, currents persist") {
    import spark.implicits._
    val current  = Seq((1, 10.0), (2, 20.0), (3, 30.0)).toDF("k", "bal")
    val incoming = Seq((2, 99.0), (9, 1.0)).toDF("k", "bal")
    val out = Scd.scd1Upsert(current, incoming, Seq("k"))
      .orderBy($"k").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getBoolean(2)))
    assert(out.toSeq == Seq((1, 10.0, false), (2, 99.0, true),
      (3, 30.0, false), (9, 1.0, true)))
  }

  test("applyCdc: delete, update, insert, resurrection, carry-forward") {
    import spark.implicits._
    val base = Seq((1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0))
      .toDF("k", "bal")
    val ops = Seq(
      (1, 0.0, "D", 1),           // plain delete
      (2, 21.0, "U", 1),          // update
      (3, 0.0, "D", 1), (3, 33.0, "U", 2), // resurrection: U after D
      (5, 50.0, "I", 1),          // insert of a new key
      (2, 22.0, "U", 2)           // later update wins
    ).toDF("k", "bal", "op", "seq")
    val out = Scd.applyCdc(base, ops, Seq("k"), "op", "seq")
      .orderBy($"k").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getString(2)))
    assert(out.toSeq == Seq((2, 22.0, "U"), (3, 33.0, "U"),
      (4, 40.0, "B"), (5, 50.0, "I")))
  }
  test("q8f audit: rebuilt dimension satisfies the SCD2 invariants") {
    val r = graft.etl.Scd.q8fScd2Audit.fn(spark, sfDir).head
    def f(c: String): Long = r.getLong(r.fieldIndex(c))
    assert(f("n_bad_open") == 0, "a key without exactly one open version")
    assert(f("n_contiguity_breaks") == 0, "validity windows not contiguous")
    val dimRows = graft.etl.Scd.q8aScd2Rebuild.fn(spark, sfDir).count()
    assert(f("n_rows") == dimRows, "audit row count differs from the dim")
    assert(f("n_keys") > 0 && f("max_versions") >= 1)
  }
}
