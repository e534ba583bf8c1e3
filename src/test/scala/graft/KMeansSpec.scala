package graft

import org.apache.spark.sql.functions._

import graft.text.KMeansQueries

class KMeansSpec extends SparkTestBase {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Full driver-side reimplementation of the quantize → medoid-init
    * → assign → rounded-mean update → reassign pipeline.
    */
  private def reference(): (Map[Int, (Long, Long, Long)], Long) = {
    import spark.implicits._
    val vecs = Tables(spark, sfDir).embeddings
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val s = vecs.flatMap(_._2).map(v => math.abs(v.toDouble)).max / 127.0
    val codes = vecs.map { case (id, e) =>
      id -> e.map(x => math.max(math.min(
        math.floor(x.toDouble / s + 0.5), 127.0), -127.0).toLong)
    }
    val k = math.max(16, math.ceil(codes.length / 128.0).toInt)
    val cent0 = codes.sortBy { case (id, _) => (md5hex(id.toString), id) }
      .take(k).zipWithIndex.map { case ((_, cs), i) => i -> cs }
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def argmin(cs: Array[Long], cents: Seq[(Int, Array[Long])]): Int =
      cents.map { case (c, m) => (d2(cs, m), c) }.min._2
    val a0 = codes.map { case (id, cs) => (id, cs, argmin(cs, cent0)) }
    val mu = a0.groupBy(_._3).map { case (c, rows) =>
      val n = rows.length.toLong
      c -> Array.tabulate(64) { d =>
        val sd = rows.map(_._2(d)).sum
        math.floor((2.0 * sd + n) / (2.0 * n)).toLong
      }
    }
    val cent1 = cent0.map { case (c, old) => c -> mu.getOrElse(c, old) }
    val a1 = a0.map { case (id, cs, c0) => (id, c0, argmin(cs, cent1)) }
    val out = cent0.map { case (c, _) =>
      c -> ((a1.count(_._2 == c).toLong, a1.count(_._3 == c).toLong,
        a1.count(r => r._2 == c && r._3 == c).toLong))
    }.toMap
    // assignment-step WCSS under cent1 must not increase
    val w0 = a0.map { case (_, cs, c0) => d2(cs, cent1.toMap.apply(c0)) }.sum
    val w1 = a1.map { case (id, _, c1) =>
      d2(codes.toMap.apply(id), cent1.toMap.apply(c1)) }.sum
    assert(w1 <= w0, s"reassignment raised WCSS: $w0 -> $w1")
    (out, codes.length.toLong)
  }

  test("kmeans step matches an independent driver-side reimplementation") {
    val got = KMeansQueries.q14hKmeansStep.fn(spark, sfDir)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val (want, n) = reference()
    assert(got == want, s"got=$got\nwant=$want")
    assert(got.values.map(_._1).sum == n, "n_init must conserve vectors")
    assert(got.values.map(_._2).sum == n, "n_next must conserve vectors")
    got.foreach { case (c, (ni, nx, st)) =>
      assert(st <= math.min(ni, nx), s"cell $c: stayed $st > min($ni, $nx)")
    }
  }

  /** Dirty-feed contract of the assign fold, matching the twin's
    * row_number(ORDER BY dist NULLS LAST, cell): a NULL code vector
    * (or NULL centroid) has NULL integer distance, which loses to
    * every real distance; an all-null vector lands in the SMALLEST
    * cell, never a -1 sentinel. The r13 degenerate-audit re-run
    * caught the sentinel leaking on the all-NULL-embedding fixture
    * after the SortAggregate-to-fold rewrite (SURVEY §8.11).
    */
  test("assign: null codes land in the smallest cell; null centroids lose") {
    import spark.implicits._
    val codes = Seq(
      (1L, Some(Seq(0L, 0L))),    // nearest to centroid 1
      (2L, Some(Seq(9L, 9L))),    // nearest to centroid 2
      (3L, None)                  // null vector -> smallest cell = 0
    ).toDF("vec_id", "cs")
    val cent = Seq(
      (0, None),                  // null centroid: must never win a
                                  // valid vector, only the null one
      (1, Some(Seq(1L, 1L))),
      (2, Some(Seq(8L, 8L)))
    ).toDF("cell", "ccs")
    val got = KMeansQueries.assign(codes, cent)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got == Map(1L -> 1, 2L -> 2, 3L -> 0), s"got=$got")
  }

  /** Empty-centroid contract: the twin's CROSS JOIN against zero
    * centroids emits no rows, so assign must too — the fold's -1
    * sentinel (reachable ONLY on an empty cents array) is filtered,
    * never emitted. Unreachable from q14h (cent0 nonempty whenever
    * codes is), but the invariant must not be implicit.
    */
  test("assign: empty centroid frame assigns nothing (twin's empty join)") {
    import spark.implicits._
    val codes = Seq((1L, Some(Seq(0L, 0L))), (2L, Option.empty[Seq[Long]]))
      .toDF("vec_id", "cs")
    val cent = Seq.empty[(Int, Option[Seq[Long]])].toDF("cell", "ccs")
    assert(KMeansQueries.assign(codes, cent).count() == 0L)
  }

  /** Twin-fidelity of the centroid mean's DENOMINATOR on a mixed
    * null/valid cell — the shape no committed fixture exercises (the
    * nulls dir is ALL-null, which is accidentally symmetric here):
    * the twin's UNNEST counts every member (n=3) while SUM skips the
    * null codes, so [2..]+[4..]+NULL must average to
    * floor((2·6+3)/6)=2, not the null-dropped floor((2·6+2)/4)=3.
    */
  test("roundedMeans counts null-code members in the denominator") {
    import spark.implicits._
    val a0 = Seq(
      (0, Some(Seq.fill(64)(2L))),
      (0, Some(Seq.fill(64)(4L))),
      (0, Option.empty[Seq[Long]]),
      (1, Option.empty[Seq[Long]])   // all-null cell -> all-null mean
    ).toDF("cell", "cs")
    val got = KMeansQueries.roundedMeans(a0)
      .collect().map(r => r.getInt(0) -> r.getSeq[Any](1)).toMap
    assert(got(0) == Seq.fill(64)(2L), s"mixed cell: ${got(0).take(3)}")
    assert(got(1).forall(_ == null), s"all-null cell: ${got(1).take(3)}")
  }

  test("plan: no cartesian, no cache, codes staged once") {
    val df = KMeansQueries.q14hKmeansStep.fn(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct"),
      s"centroid fan-out fell back to a cartesian:\n${plan.take(2000)}")
    assert(!plan.contains("InMemoryRelation") &&
      !plan.contains("InMemoryTableScan"),
      s"q14h pinned a frame:\n${plan.take(2000)}")
    // the quantize pass lives inside the eager codes checkpoint; the
    // query plan proper must not re-read the embeddings parquet
    assert(!plan.contains("embeddings.parquet"),
      s"a consumer re-read the corpus instead of staged codes:\n" +
        plan.take(2000))
  }
}
