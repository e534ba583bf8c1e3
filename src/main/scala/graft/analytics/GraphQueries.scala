package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.GraftQuery

/** Graph analytics over relational edge lists: weighted PageRank as an
  * iterative Pregel-style dataflow — each iteration is ONE co-keyed
  * join (rank onto out-edges) plus ONE destination-keyed hash agg,
  * which is exactly the message-passing shape that scales: edges
  * partition by src, messages combine map-side per dst, and the
  * rank frame (node grain, ≪ edges) is checkpointed each round so 8
  * iterations never build an 8-deep lineage.
  *
  * Determinism (hash-gate discipline): per-message contributions snap
  * to fixed-point BIGINT (`⌊pr·ratio·1e15 + ½⌋`) before the SUM, so
  * the aggregation is order-free; the damping update is the same
  * `0.15/N + 0.85·(S/1e15)` expression tree in both engines — the
  * whole 8-round chain matches bitwise (the q14j device applied to
  * graphs).
  */
object GraphQueries {

  private val Iters = 8

  /** Weighted PageRank. `edges` must be directed (src, dst, w) with
    * every node having out-degree ≥ 1 (true for symmetric graphs —
    * callers with dangling nodes must handle them first; this operator
    * would silently drop their mass).
    */
  def pageRank(edges: DataFrame, src: String, dst: String, w: String,
      iters: Int = Iters): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val outd = edges.groupBy(col(src)).agg(sum(col(w)).as("__out"))
    val e = edges.join(outd, src)
      .select(col(src).as("__src"), col(dst).as("__dst"),
        (col(w).cast("double") / col("__out").cast("double")).as("__ratio"))
      .localCheckpoint(true)
    val n = e.select($"__src").distinct().count()
    val nD = n.toDouble
    var pr = e.select($"__src".as("node")).distinct()
      .select($"node", (lit(1.0) / lit(nD)).as("pr"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      pr = e.join(pr, e("__src") === pr("node"))
        .groupBy($"__dst")
        .agg(sum(floor($"pr" * $"__ratio" * 1e15 + 0.5).cast("long")).as("s"))
        .select($"__dst".as("node"),
          (lit(0.15) / lit(nD) +
            lit(0.85) * ($"s".cast("double") / lit(1e15))).as("pr"))
        .localCheckpoint(true)
    }
    pr
  }

  /** Shared DuckDB twin of the iteration chain (unrolled MATERIALIZED
    * CTEs — same structure the Spark loop executes).
    */
  private def pageRankSql(iters: Int): String = {
    val steps = (1 to iters).map { k =>
      s"""pr$k AS MATERIALIZED (
         |  SELECT e.t AS node,
         |    0.15 / nn + 0.85 * (CAST(SUM(CAST(FLOOR(p.pr * e.ratio * 1e15
         |      + 0.5) AS BIGINT)) AS DOUBLE) / 1e15) AS pr
         |  FROM e JOIN pr${k - 1} p ON e.s = p.node, nn
         |  GROUP BY e.t, nn.nn)""".stripMargin
    }
    steps.mkString(",\n")
  }

  /** q24e — PageRank centrality of parts in the co-purchase graph
    * (nodes = parts, edges = bought-in-the-same-order, weight =
    * co-occurrence count). The graph build rides the q25 basket
    * device: (basket, item) dedup grain first, per-basket sorted
    * arrays, pairs emitted MAP-SIDE (fan-out ≤ C(items/basket, 2)) —
    * never an items self-join; symmetrization doubles the pair rows,
    * which also guarantees out-degree ≥ 1 for every node.
    */
  val q24ePagerank: GraftQuery = GraftQuery(
    "q24e_copurchase_pagerank",
    s"""WITH items AS (
       |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |up AS (
       |  SELECT a.l_partkey AS s, b.l_partkey AS t, CAST(COUNT(*) AS BIGINT) AS w
       |  FROM items a JOIN items b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2),
       |e0 AS (
       |  SELECT s, t, w FROM up UNION ALL SELECT t AS s, s AS t, w FROM up),
       |outd AS (SELECT s, SUM(w) AS o FROM e0 GROUP BY 1),
       |e AS MATERIALIZED (
       |  SELECT e0.s, e0.t, CAST(w AS DOUBLE) / CAST(o AS DOUBLE) AS ratio
       |  FROM e0 JOIN outd ON e0.s = outd.s),
       |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nn FROM outd),
       |pr0 AS MATERIALIZED (
       |  SELECT outd.s AS node, 1.0 / nn.nn AS pr FROM outd, nn),
       |${pageRankSql(Iters)}
       |SELECT node AS l_partkey, pr FROM pr$Iters""".stripMargin) {
    (spark, dir) =>
      import spark.implicits._
      val t = Tables(spark, dir)
      val items = t.lineitem.select($"l_orderkey", $"l_partkey").distinct()
      val up = items
        .groupBy($"l_orderkey")
        .agg(sort_array(collect_set($"l_partkey")).as("bs"))
        .select(explode(expr(
          """flatten(transform(bs, (x, i) ->
            |  transform(slice(bs, i + 2, size(bs)), y ->
            |    struct(x AS s, y AS t))))""".stripMargin)).as("p"))
        .select($"p.s", $"p.t")
        .groupBy($"s", $"t")
        .agg(count(lit(1)).as("w"))
      val edges = up.unionAll(up.select($"t".as("s"), $"s".as("t"), $"w"))
      pageRank(edges, "s", "t", "w")
        .select($"node".as("l_partkey"), $"pr")
  }

  val all: Seq[GraftQuery] = Seq(q24ePagerank)
}
