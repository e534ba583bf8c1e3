package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.DistributedRank

class DistributedRankSpec extends SparkTestBase {

  // Skewed fixture: one hot group with 1000 rows, two small groups.
  // Values are shuffled deterministically so range sampling sees an
  // unsorted input, as it would in production.
  private lazy val skewed = {
    import spark.implicits._
    val rows =
      (0 until 1000).map(i => ("hot", (i * 7919) % 1000, s"r$i")) ++
        (0 until 5).map(i => ("cold_a", i, s"a$i")) ++
        (0 until 3).map(i => ("cold_b", i, s"b$i"))
    rows.toDF("grp", "score", "id")
  }

  test("rank/ntile match the window form on a skewed fixture") {
    import spark.implicits._
    val w = Window.partitionBy($"grp").orderBy($"score".desc, $"id")
    val expected = skewed
      .withColumn("rnk", rank().over(w).cast("long"))
      .withColumn("band", ntile(7).over(w))
    val got = DistributedRank.rankNtile(
      skewed, Seq("grp"), Seq($"score".desc, $"id"),
      ntiles = 7, rankName = "rnk", ntileName = "band",
      numPartitions = 8)
    assert(got.count() == expected.count())
    assert(expected.exceptAll(got).count() == 0 &&
      got.exceptAll(expected).count() == 0)
  }

  /** The r16 NULLS LAST normalization (DistributedRank.nullsLast):
    * the operator's sort hides behind an RDD boundary the
    * NullOrderCensus cannot see, so the operator itself pins
    * DuckDB's default — a nullable ASC order value ranks LAST, not
    * Spark's default FIRST. Mutation m52 flips the pin → red.
    */
  test("a NULL ASC order value ranks LAST (DuckDB default), not first") {
    import spark.implicits._
    val df = Seq(
      (10L, Option(3L)), (11L, Option.empty[Long]),
      (12L, Option(1L)), (13L, Option(2L)))
      .toDF("id", "v")
    val got = DistributedRank.rankNtile(
      df, Seq.empty, Seq($"v".asc, $"id".asc),
      ntiles = 2, rankName = "rnk", ntileName = "nt", numPartitions = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(12L -> 1L, 13L -> 2L, 10L -> 3L, 11L -> 4L),
      s"got $got — the NULL row must rank LAST under asc " +
        "(nulls-first would shift every real row's rank)")
  }

  test("a hot group spans more than one task") {
    import spark.implicits._
    // Re-derive the operator's partitioning and assert the range
    // sampler actually splits the 1000-row group across partitions —
    // the whole point of the scale path vs. the window's 1-task sort.
    val spread = skewed
      .repartitionByRange(8, $"grp", $"score".desc, $"id")
      .select($"grp", spark_partition_id().as("pid"))
      .groupBy($"grp").agg(countDistinct($"pid").as("tasks"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(spread("hot") > 1, s"hot group used ${spread("hot")} task(s)")
  }

  test("ntile split is exact: first (N mod n) tiles get the extra row") {
    import spark.implicits._
    // 10 rows into 3 tiles -> sizes 4,3,3 (SQL NTILE semantics)
    val df = (0 until 10).map(i => ("g", i)).toDF("grp", "v")
    val got = DistributedRank.rankNtile(
      df, Seq("grp"), Seq($"v"), ntiles = 3,
      rankName = "rnk", ntileName = "band", numPartitions = 4)
    val sizes = got.groupBy($"band").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes == Map(1 -> 4L, 2 -> 3L, 3 -> 3L))
  }
}
