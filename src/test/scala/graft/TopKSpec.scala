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
      .mapValues { case (_, s, id) => (s, id) }
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
}
