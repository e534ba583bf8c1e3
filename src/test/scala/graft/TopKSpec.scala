package graft

import org.apache.spark.sql.functions._

import graft.functions.TopK

class TopKSpec extends SparkTestBase {

  test("heap top-k aggregator equals sort+limit per group") {
    import spark.implicits._
    val t = Tables(spark, sfDir)
    val pairs = t.lineitem
      .join(t.orders, $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey".as("grp"),
        $"l_extendedprice".as("score"), $"l_orderkey".as("id"))

    val k = 3
    val agg = TopK.TopKAggregator(k).toColumn
    val viaHeap = pairs
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues { case (_, s, id) =>
        (java.lang.Double.valueOf(s), id): TopK.In
      }
      .agg(agg.name("topk"))
      .flatMap { case (grp, entries) =>
        entries.zipWithIndex.map { case ((s, id), i) =>
          (grp, s, id, i + 1) }
      }
      .toDF("grp", "score", "id", "rank")

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"grp").orderBy($"score".desc, $"id")
    val viaSort = pairs
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"grp", $"score", $"id", $"rank")

    assert(viaHeap.exceptAll(viaSort).count() == 0 &&
      viaSort.exceptAll(viaHeap).count() == 0,
      "heap top-k differs from sort+limit")
    assert(viaHeap.count() > 0)
  }

  /** The operator-level NULL contract (r16, hardening the r15 q21
    * root cause): a NULL score is IGNORED — never coerced to 0.0 by
    * the encoder boundary — and an all-null group finishes EMPTY.
    * Mutation m44 restores the coercion and must turn this red.
    */
  test("NULL scores never enter the heap; an all-null group is empty") {
    import spark.implicits._
    val df = Seq(
      (1L, Option(5.0), 10L),
      (1L, Option.empty[Double], 11L), // ignored, NOT ranked as 0.0
      (1L, Option(3.0), 12L),
      (1L, Option(-1.0), 13L), // a REAL negative must still rank
      (2L, Option.empty[Double], 20L) // all-null group → no output
    ).toDF("grp", "score", "id")
    val top = TopK.topk(2)
    val out = df.groupBy($"grp")
      .agg(top($"score", $"id").as("top"))
      .select($"grp", posexplode($"top").as(Seq("pos", "e")))
      .select($"grp", $"e._1".as("score"), $"e._2".as("id"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .toSeq.sorted
    assert(out == Seq((1L, 3.0, 12L), (1L, 5.0, 10L)),
      s"got $out — a NULL score leaked into the heap (or a real " +
        "negative was dropped): 'no data' must never rank as 0.0")
  }
}
