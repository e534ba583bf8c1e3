package graft

import org.apache.spark.sql.functions._

import graft.operators.EditDistanceJoin

/** Deletion-neighborhood edit-distance join: exact parity with a
  * driver-side brute-force Levenshtein sweep, plus plan shape.
  */
class EditDistanceSpec extends SparkTestBase {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("distance-1 pairs match brute force on an adversarial random vocab") {
    // small alphabet + short lengths force heavy variant collisions,
    // including distance-2 tokens meeting at a shared deletion — the
    // case the post-filter must reject
    val rnd = new scala.util.Random(42)
    val vocab = (1 to 150).map { _ =>
      (3 + rnd.nextInt(4) to 1 by -1)
        .map(_ => "abc" (rnd.nextInt(3))).mkString
    }.distinct
    val df = vocab.zipWithIndex.map { case (t, i) => (t, i.toLong) }
      .toDF("tok", "cnt")
    val got = EditDistanceJoin.distance1Pairs(df, "tok", "cnt").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val want = (for {
      a <- vocab; b <- vocab if a < b && lev(a, b) <= 1
    } yield (a, b)).toSet
    assert(got == want,
      s"missing=${want -- got} spurious=${got -- want}")
    assert(want.nonEmpty, "degenerate test: no distance-1 pairs generated")
    // and the blocking really did admit distance-2 collisions that the
    // levenshtein post-filter had to reject (otherwise this vocab is
    // not exercising the interesting path)
    val d2 = (for {
      a <- vocab; b <- vocab
      if a < b && lev(a, b) == 2 &&
        (deletions(a) intersect deletions(b)).nonEmpty
    } yield (a, b))
    assert(d2.nonEmpty, "no distance-2 collisions exercised")
  }

  private def deletions(s: String): Set[String] =
    (0 until s.length).map(i => s.take(i) + s.drop(i + 1)).toSet + s

  test("covers all three edit kinds and carries payload") {
    val df = Seq(("cart", 10L), ("cat", 5L), ("bat", 3L), ("ca", 1L),
      ("dog", 7L)).toDF("tok", "cnt")
    val got = EditDistanceJoin.distance1Pairs(df, "tok", "cnt").collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.keySet == Set(("cart", "cat"), ("bat", "cat"), ("ca", "cat")),
      s"got ${got.keySet}")
    assert(got(("cart", "cat")) == (10L, 5L), "payload rides the pair")
  }

  test("plan is an equi-join on the variant key — no cartesian product") {
    val df = Seq(("cart", 1L), ("cat", 1L), ("dog", 1L)).toDF("tok", "cnt")
    val out = EditDistanceJoin.distance1Pairs(df, "tok", "cnt")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"candidate generation is not an equi-join:\n$plan")
    assert(plan.contains("__variant"), "join key should be the variant")
  }

  test("reserved column name is guarded") {
    val df = Seq(("a", 1L)).toDF("__variant", "cnt")
    intercept[IllegalArgumentException] {
      EditDistanceJoin.distance1Pairs(df, "__variant", "cnt")
    }
  }
}
