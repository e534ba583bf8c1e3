package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.GraftQuery
import graft.Staging.Stageable

/** q14h — one Lloyd k-means refinement step over int8-quantized
  * embeddings: the clustering verb of SemDeDup-style curation made
  * deterministic enough to oracle-gate.
  *
  * Float k-means cannot be hash-gated: centroid means are
  * order-dependent double sums. The device here is GLOBAL symmetric
  * int8 quantization — one corpus-wide scale s = max|x|/127 (MAX is
  * order-free), codes c_j = clamp(⌊x_j/s + ½⌋) — after which EVERY
  * quantity the algorithm compares is an integer: distances are
  * Σ(c−m)² in BIGINT, argmin ties break on cell id, and the updated
  * centroid is the rounded integer mean ⌊Σc/n + ½⌋ computed as
  * FLOOR((2·Σc + n) / (2n)) — one exactly-rounded double division
  * whose floor both engines agree on (the quotient is a rational
  * with denominator 2n, never within a ulp of an integer it doesn't
  * equal). Zero float ever decides an assignment; k-means over
  * quantized codes is also the SCALE practice (int-SIMD distance
  * kernels, 4× smaller working set).
  *
  * Steps: md5-medoid initial centroids (the q14c device, k = N/128
  * clamped to ≥16) → integer-L2 assignment → rounded-integer-mean
  * update (empty cells keep their old centroid) → reassignment.
  * Output is one all-BIGINT row per cell: members before/after and
  * how many stayed.
  *
  * Scale shape: both assignment passes are per-row folds over the
  * broadcast centroid array (the assignCells shape — a pure map, no
  * exchange); the centroid update explodes to (cell, dim) grain but
  * map-side combine reduces each partition to ≤ k·64 partial sums
  * before the shuffle. Nothing is cached; the corpus streams through
  * exactly three passes.
  */
object KMeansQueries {

  private val Dim = 64

  /** clamp(⌊x/s + ½⌋, ±127) as BIGINT; s = 0 (all-zero corpus) → 0. */
  private def codeOf(x: Column, s: Column): Column =
    when(s === 0.0, lit(0L)).otherwise(
      greatest(least(floor(x.cast("double") / s + 0.5), lit(127.0)),
        lit(-127.0)).cast("long"))

  private def d2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)

  /** argmin-cell assignment: the centroid table collapses to ONE
    * cell-ascending array row, a 1-row broadcast join attaches it,
    * and a higher-order fold keeps the best (integer L2, cell) per
    * vector — strict `<` over the ascending array = min distance,
    * ties → smallest cell. A pure projection: zero shuffle, zero
    * per-key state. (The earlier crossJoin + groupBy(vec_id)
    * min(struct) form planned SortAggregate — struct buffers are not
    * hash-aggregable — and external-sorted the whole N·k fan-out; see
    * the assignCells note in SimilarityQueries.)
    */
  private[graft] def assign(codes: DataFrame, cent: DataFrame): DataFrame = {
    import codes.sparkSession.implicits._
    val centArr = cent
      .agg(sort_array(collect_list(struct($"cell", $"ccs"))).as("cents"))
    // Null handling must match the twin's row_number(ORDER BY dist,
    // cell): a NULL code vector or NULL centroid makes the integer
    // distance NULL, which orders LAST (loses to every real distance)
    // with the cell tie-break — so a null distance coalesces to
    // Long.MaxValue, and the fold seeds at cents[0].cell (the
    // smallest cell), NOT a -1 sentinel: an all-null vector must land
    // in the smallest cell like the twin, not vanish. The sentinel
    // leak was caught by the r13 degenerate-audit re-run on the
    // all-NULL-embedding fixture (SURVEY §8.11); the max(struct) form
    // this fold replaced had matched via nulls-first struct ordering.
    // private[graft] so KMeansSpec can pin the null contract directly.
    val best = aggregate(
      $"cents",
      struct(lit(Long.MaxValue).as("bd"),
        coalesce(get($"cents", lit(0)).getField("cell"), lit(-1))
          .as("cell")),
      (acc, c) => {
        val d = coalesce(d2($"cs", c.getField("ccs")), lit(Long.MaxValue))
        when(d < acc.getField("bd"),
          struct(d.as("bd"), c.getField("cell").as("cell"))).otherwise(acc)
      },
      acc => acc.getField("cell"))
    // cell = -1 occurs IFF the centroid frame is empty (the seed's
    // coalesce fires only on an empty cents array; with a nonempty
    // array an all-null-distance vector keeps the SEED cents[0].cell,
    // a real cell, because strict `<` never beats the Long.MaxValue
    // seed). The twin's CROSS JOIN against zero centroids emits no
    // rows, so drop the sentinel rows to keep the empty-centroid
    // semantics identical instead of leaving the invariant implicit
    // (unreachable from q14h, where cent0 is nonempty whenever codes
    // is — KMeansSpec pins the empty-frame contract directly).
    codes.crossJoin(broadcast(centArr))
      .select($"vec_id", $"cs", best.as("cell"))
      .filter($"cell" =!= -1)
  }

  /** Rounded integer mean per (cell, dim) over a (cell, cs) member
    * frame; map-side combine bounds the explode fan-out at k·64
    * partials per partition. A NULL code vector explodes as 64 NULL
    * elements (not zero rows): the twin's UNNEST(range) counts every
    * member in the mean's denominator while SUM skips the NULLs —
    * dropping the rows instead would shift the rounded mean of any
    * cell with mixed null/valid members (same dirty-feed contract as
    * the assign fold; no committed fixture exercises the MIXED shape,
    * so KMeansSpec pins it directly — the m33/m34 lesson again).
    */
  private[graft] def roundedMeans(a0: DataFrame): DataFrame = {
    import a0.sparkSession.implicits._
    a0
      .select($"cell", posexplode(coalesce($"cs",
        array_repeat(lit(null).cast("long"), Dim))).as(Seq("d", "v")))
      .groupBy($"cell", $"d")
      .agg(sum($"v").as("sd"), count(lit(1)).as("n"))
      .withColumn("m",
        floor(($"sd" * 2 + $"n").cast("double") / ($"n" * 2)).cast("long"))
      .groupBy($"cell")
      .agg(transform(sort_array(collect_list(struct($"d", $"m"))),
        s => s.getField("m")).as("mcs"))
  }

  val q14hKmeansStep: GraftQuery = GraftQuery(
    "q14h_kmeans_step",
    s"""WITH sc AS (
       |  SELECT MAX(list_reduce(list_transform(embedding,
       |           x -> abs(CAST(x AS DOUBLE))), (a, b) -> greatest(a, b)))
       |         / 127.0 AS s
       |  FROM embeddings),
       |codes AS (
       |  SELECT vec_id,
       |         list_transform(embedding, x -> CASE WHEN sc.s = 0 THEN 0
       |           ELSE CAST(greatest(least(floor(CAST(x AS DOUBLE) / sc.s
       |                  + 0.5), 127.0), -127.0) AS BIGINT) END) AS cs
       |  FROM embeddings, sc),
       |kk AS (
       |  SELECT GREATEST(16, CAST(ceil(count(*) / 128.0) AS BIGINT)) AS k
       |  FROM embeddings),
       |ranked AS (
       |  SELECT vec_id, cs,
       |         row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
       |                            vec_id) AS rn
       |  FROM codes),
       |cent0 AS (
       |  SELECT CAST(rn - 1 AS INTEGER) AS cell, cs AS ccs
       |  FROM ranked, kk WHERE rn <= kk.k),
       |a0r AS (
       |  SELECT c.vec_id, c.cs, t.cell,
       |         row_number() OVER (PARTITION BY c.vec_id ORDER BY
       |           list_reduce(list_transform(range(1, ${Dim + 1}),
       |             i -> (c.cs[i] - t.ccs[i]) * (c.cs[i] - t.ccs[i])),
       |             (a, b) -> a + b), t.cell) AS arn
       |  FROM codes c CROSS JOIN cent0 t),
       |a0 AS (SELECT vec_id, cs, cell FROM a0r WHERE arn = 1),
       |dims AS (
       |  SELECT cell, i AS d, CAST(SUM(cs[i]) AS BIGINT) AS sd,
       |         COUNT(*) AS n
       |  FROM a0, UNNEST(range(1, ${Dim + 1})) AS t(i)
       |  GROUP BY 1, 2),
       |mu AS (
       |  SELECT cell,
       |         LIST(CAST(FLOOR(CAST(2 * sd + n AS DOUBLE) / (2 * n))
       |                   AS BIGINT) ORDER BY d) AS mcs
       |  FROM dims GROUP BY 1),
       |cent1 AS (
       |  SELECT c.cell, COALESCE(m.mcs, c.ccs) AS ccs
       |  FROM cent0 c LEFT JOIN mu m ON m.cell = c.cell),
       |a1r AS (
       |  SELECT c.vec_id, c.cell AS cell0, t.cell AS cell1,
       |         row_number() OVER (PARTITION BY c.vec_id ORDER BY
       |           list_reduce(list_transform(range(1, ${Dim + 1}),
       |             i -> (c.cs[i] - t.ccs[i]) * (c.cs[i] - t.ccs[i])),
       |             (a, b) -> a + b), t.cell) AS arn
       |  FROM a0 c CROSS JOIN cent1 t),
       |a1 AS (SELECT vec_id, cell0, cell1 FROM a1r WHERE arn = 1)
       |SELECT c.cell,
       |       COALESCE(i.n, 0) AS n_init,
       |       COALESCE(x.n, 0) AS n_next,
       |       COALESCE(st.n, 0) AS n_stayed
       |FROM cent0 c
       |LEFT JOIN (SELECT cell0 AS cell, COUNT(*) AS n FROM a1
       |           GROUP BY 1) i ON i.cell = c.cell
       |LEFT JOIN (SELECT cell1 AS cell, COUNT(*) AS n FROM a1
       |           GROUP BY 1) x ON x.cell = c.cell
       |LEFT JOIN (SELECT cell0 AS cell, COUNT(*) AS n FROM a1
       |           WHERE cell0 = cell1 GROUP BY 1) st
       |  ON st.cell = c.cell""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val emb = Tables(spark, dir).embeddings.select($"vec_id", $"embedding")
    val k = SimilarityQueries.ivfK(emb.count())
    val sc = emb.agg(
      (max(aggregate(transform($"embedding", v => abs(v.cast("double"))),
        lit(0.0), (a, b) => greatest(a, b))) / 127.0).as("s"))
    // quantize once; three consumers (cent0, a0, a1) read the staged
    // codes — the corpus is scanned exactly once (q12s staging)
    val codes = emb.crossJoin(broadcast(sc))
      .select($"vec_id",
        transform($"embedding", x => codeOf(x, $"s")).as("cs"))
      .staged
    val hashOrd = md5($"vec_id".cast("string").cast("binary"))
    val cent0 = codes.orderBy(hashOrd.asc, $"vec_id".asc).limit(k)
      .withColumn("cell",
        (row_number().over(Window.orderBy(hashOrd.asc, $"vec_id".asc)) - 1)
          .cast("int"))
      .select($"cell", $"cs".as("ccs"))
    val a0 = assign(codes, cent0)
    val mu = roundedMeans(a0)
    val cent1 = cent0.join(mu, Seq("cell"), "left")
      .select($"cell", coalesce($"mcs", $"ccs").as("ccs"))
    val a1 = assign(a0.select($"vec_id", $"cs", $"cell".as("cell0")), cent1)
      .withColumnRenamed("cell", "cell1")
      .join(a0.select($"vec_id", $"cell".as("cell0")), "vec_id")
    val nInit = a1.groupBy($"cell0".as("cell"))
      .agg(count(lit(1)).as("n_init"))
    val nNext = a1.groupBy($"cell1".as("cell"))
      .agg(count(lit(1)).as("n_next"))
    val nStay = a1.filter($"cell0" === $"cell1")
      .groupBy($"cell0".as("cell")).agg(count(lit(1)).as("n_stayed"))
    cent0.select($"cell")
      .join(nInit, Seq("cell"), "left")
      .join(nNext, Seq("cell"), "left")
      .join(nStay, Seq("cell"), "left")
      .select($"cell", coalesce($"n_init", lit(0L)).as("n_init"),
        coalesce($"n_next", lit(0L)).as("n_next"),
        coalesce($"n_stayed", lit(0L)).as("n_stayed"))
  }

  val all: Seq[GraftQuery] = Seq(q14hKmeansStep)
}
