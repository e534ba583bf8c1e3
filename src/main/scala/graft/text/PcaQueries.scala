package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.GraftQuery
import graft.Staging.Stageable

/** Embedding decorrelation: exact covariance + top principal component
  * by power iteration — the whitening/variance-analysis step of an
  * embedding pipeline (dimensionality audit before ANN indexing).
  *
  * Determinism design (the hash gates force bitwise cross-engine
  * equality, which float linear algebra never gives for free):
  *  - Second/first moments are fixed-point BIGINT sums of per-row
  *    quantized products (`floor(x·y·1e12 + ½)`): float×float is exact
  *    in double, quantization is IEEE-deterministic, and BIGINT
  *    addition is order-free — so the distributed aggregation is
  *    invariant to partitioning at any scale.
  *  - The covariance DOUBLE is derived from those integers through one
  *    shared SQL expression string (`expr()`-evaluated in Spark,
  *    interpolated into the DuckDB twin — the q9p device), so both
  *    engines build the same expression tree over the same integers.
  *  - Power iteration runs in the quantized space too: every matvec
  *    term and every norm term snaps to BIGINT before summing, and the
  *    only non-arithmetic op is IEEE sqrt — so 8 iterations stay
  *    bit-identical whether they run on the Spark driver (d×d is tiny)
  *    or as 8 unrolled CTEs in DuckDB.
  *
  * Scale (100 TB): the moment aggregation is ONE corpus pass whose
  * d(d+1)/2-struct fan-out collapses map-side (hash agg keyed on
  * (i,j) — ≤2080 partials per partition reach the shuffle); the d×d
  * solve is driver-side O(d²); projections are map-only against the
  * broadcast component. Nothing is cached.
  */
object PcaQueries {

  private val D = 64
  /** Moment quantizer (values ≤0.6 ⇒ row terms ≤3.6e11; 1e7 rows still
    * fit BIGINT with 2,500× headroom). OUT-OF-ENVELOPE inputs (e.g. a
    * dirty corpus of |x| = 10 unnormalized vectors past ~9e4 rows,
    * where row terms hit 1e14) overflow the BIGINT sum LOUDLY under
    * ANSI (ARITHMETIC_OVERFLOW) — detection, not silent corruption,
    * the same contract as the NaN position in SURVEY §8.9. The q12y
    * adaptive DECIMAL(38) escape hatch is the known widening if a
    * real corpus ever needs the larger envelope. */
  private val MomScale = "1e12"
  /** Iteration quantizer (covariances ≤0.1, |v|≤1 ⇒ 64-term sums
    * ≤6.4e15 < 2^53, so the BIGINT→DOUBLE casts stay exact).
    * Out-of-envelope covariances (unnormalized dirty corpora) overflow
    * the TWIN's INT64 iteration loudly while the Spark side's
    * driver-float iteration does not — a known, documented asymmetry
    * of the quantized-oracle device itself (the degenerate-dir twin
    * audit, SURVEY §8.9): bitwise cross-engine equality is defined
    * within the envelope; outside it one engine refuses. */
  private val ItScale = "1e15"

  /** The one covariance formula, shared textually by both engines. */
  private val covExpr =
    s"(CAST(s_xy AS DOUBLE)/$MomScale" +
      s" - (CAST(s_x AS DOUBLE)/$MomScale)" +
      s" * (CAST(s_y AS DOUBLE)/$MomScale)" +
      " / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)"

  /** Distributed quantized moments → (i, j, s_xy, s_x, s_y, n, cov)
    * for the upper triangle i ≤ j (1-based dims).
    */
  def covariance(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // a NULL vector is not an observation: excluded from the moments
    // AND from n on both engines (counting it would deflate every
    // covariance; letting it through NULLs the whole matrix and
    // crashes the driver-side getDouble)
    val xd = emb.filter($"embedding".isNotNull).select($"vec_id",
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("xd"))
    // ONE corpus pass: pair moments (i ≤ j) and first moments (tagged
    // j = 0) ride the same inline fan-out into the same (i, j)-keyed
    // hash agg — the fan-out collapses map-side to ≤ d(d+3)/2 partials
    // per partition before the shuffle. The d(d+3)/2-row result is
    // staged with an eager localCheckpoint (the q12s device — tiny,
    // not a cache pin) because its THREE consumers below (p2 + two
    // broadcast m1 sides) would otherwise each re-derive the corpus
    // scan: 3-consumer ReuseExchange is exactly the racy shape the
    // r7 verdict flagged. PcaSpec pins zero parquet scans downstream.
    val agg = xd.select(expr(
      s"""inline(concat(
         |  flatten(transform(sequence(1, $D), i ->
         |    transform(sequence(i, $D), j ->
         |      struct(i, j, CAST(floor(element_at(xd, i) * element_at(xd, j)
         |        * $MomScale + 0.5d) AS BIGINT) AS p)))),
         |  transform(sequence(1, $D), i ->
         |    struct(i, 0 AS j, CAST(floor(element_at(xd, i) * $MomScale
         |      + 0.5d) AS BIGINT) AS p))))""".stripMargin))
      .groupBy($"i", $"j")
      .agg(sum($"p").as("s"), count(lit(1)).as("n"))
      .staged
    val p2 = agg.filter($"j" =!= 0)
      .select($"i", $"j", $"s".as("s_xy"), $"n")
    val m1 = agg.filter($"j" === 0).select($"i", $"s")
    p2.join(broadcast(m1.withColumnRenamed("s", "s_x")), Seq("i"))
      .join(broadcast(m1.toDF("j", "s_y")), Seq("j"))
      .select($"i".cast("int").as("i"), $"j".cast("int").as("j"),
        $"s_xy", $"s_x", $"s_y", $"n", expr(covExpr).as("cov"))
  }

  /** Shared DuckDB CTEs reproducing [[covariance]] from the parquet. */
  private def covSql(src: String): String =
    s"""ex AS (
       |  SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
       |  FROM $src, (SELECT unnest(range(1, ${D + 1})) AS i)
       |  WHERE embedding IS NOT NULL),
       |p2 AS (
       |  SELECT a.i AS i, b.i AS j,
       |    CAST(SUM(CAST(FLOOR(a.x * b.x * $MomScale + 0.5) AS BIGINT)) AS BIGINT) AS s_xy,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.i <= b.i
       |  GROUP BY 1, 2),
       |m1 AS (
       |  SELECT i, CAST(SUM(CAST(FLOOR(x * $MomScale + 0.5) AS BIGINT)) AS BIGINT) AS s
       |  FROM ex GROUP BY 1),
       |cov AS MATERIALIZED (
       |  SELECT CAST(p2.i AS INTEGER) AS i, CAST(p2.j AS INTEGER) AS j,
       |    s_xy, ma.s AS s_x, mb.s AS s_y, n, $covExpr AS cov
       |  FROM p2 JOIN m1 ma ON p2.i = ma.i JOIN m1 mb ON p2.j = mb.i)""".stripMargin

  /** q14i — the covariance matrix itself, hash-gated. */
  val q14iEmbedCovariance: GraftQuery = GraftQuery(
    "q14i_embed_covariance",
    s"""WITH ${covSql("embeddings")}
       |SELECT i, j, s_xy, cov FROM cov""".stripMargin) { (spark, dir) =>
    covariance(Tables(spark, dir).embeddings).select("i", "j", "s_xy", "cov")
  }

  private val Iters = 8

  /** Driver-side fixed-point power iteration on the collected d×d
    * quantized covariance. Returns (component, eigenvalue estimate).
    * Every arithmetic step mirrors the SQL twin exactly: quantize →
    * BIGINT-sum → IEEE divide/sqrt.
    */
  def powerIteration(cq: Array[Array[Long]]): (Array[Double], Double) = {
    val itScale = ItScale.toDouble
    val cd = cq.map(_.map(_.toDouble / itScale))
    var v = Array.fill(D)(0.125) // 1/sqrt(64), exact in binary
    var lambda = 0.0
    for (_ <- 1 to Iters) {
      val s = Array.tabulate(D) { i =>
        var acc = 0L
        var j = 0
        while (j < D) {
          acc += math.floor(cd(i)(j) * v(j) * itScale + 0.5).toLong
          j += 1
        }
        acc
      }
      val u = s.map(_.toDouble / itScale)
      val q = u.map(x => math.floor(x * x * itScale + 0.5).toLong).sum
      lambda = math.sqrt(q.toDouble / itScale)
      // λ = 0 means |C·v| rounds to zero at quantizer resolution — a
      // zero-variance corpus has NO principal direction. Normalizing
      // by 0 would go engine-DIVERGENT garbage (this loop saturates
      // through ±Inf→Long.MaxValue; the twin propagates NaN), so both
      // engines pin v := 0: the iteration is then a stable fixed point
      // and the query answers eigval 0 / all-zero projections
      // (degenerate-dir twin audit, SURVEY §8.9 — flushed by the flat
      // warehouse). Whenever λ > 0 it equals ≈|u|, so v stays a unit
      // vector and this branch is never taken on real data.
      v = if (lambda == 0.0) Array.fill(D)(0.0) else u.map(_ / lambda)
    }
    (v, lambda)
  }

  /** The same 8 iterations as unrolled DuckDB CTEs (generated by the
    * same loop structure the driver runs — one matvec + one normalize
    * pair per iteration).
    */
  private def powerSql: String = {
    val it0 = s"it0 AS MATERIALIZED (SELECT i, 0.125 AS v FROM (SELECT unnest(range(1, ${D + 1})) AS i))"
    val steps = (1 to Iters).map { k =>
      s"""s$k AS MATERIALIZED (
         |  SELECT cf.i AS i,
         |    CAST(SUM(CAST(FLOOR((CAST(cf.cq AS DOUBLE) / $ItScale) * p.v
         |      * $ItScale + 0.5) AS BIGINT)) AS BIGINT) AS s
         |  FROM cfull cf JOIN it${k - 1} p ON cf.j = p.i GROUP BY 1),
         |n$k AS (
         |  SELECT SQRT(CAST(SUM(CAST(FLOOR((CAST(s AS DOUBLE) / $ItScale)
         |    * (CAST(s AS DOUBLE) / $ItScale) * $ItScale + 0.5) AS BIGINT))
         |    AS DOUBLE) / $ItScale) AS nrm
         |  FROM s$k),
         |it$k AS MATERIALIZED (
         |  SELECT i, CASE WHEN nrm = 0 THEN 0.0
         |            ELSE (CAST(s AS DOUBLE) / $ItScale) / nrm END AS v
         |  FROM s$k, n$k)""".stripMargin
    }
    (it0 +: steps).mkString(",\n")
  }

  /** q14j — per-vector projection onto the top principal component
    * (plus the eigenvalue estimate), end-to-end hash-gated: any
    * divergence in moments, quantization, or any of the 8 iterations
    * breaks every output row.
    */
  val q14jPcaProject: GraftQuery = GraftQuery(
    "q14j_pca_project",
    s"""WITH ${covSql("embeddings")},
       |cq AS (
       |  SELECT i, j, CAST(FLOOR(cov * $ItScale + 0.5) AS BIGINT) AS cq
       |  FROM cov),
       |cfull AS MATERIALIZED (
       |  SELECT i, j, cq FROM cq
       |  UNION ALL
       |  SELECT j AS i, i AS j, cq FROM cq WHERE i < j),
       |$powerSql
       |SELECT e.vec_id,
       |  CAST(SUM(CAST(FLOOR(ex.x * p.v * $MomScale + 0.5) AS BIGINT))
       |    AS DOUBLE) / $MomScale AS proj,
       |  (SELECT nrm FROM n$Iters) AS eigval
       |FROM embeddings e
       |JOIN ex ON ex.vec_id = e.vec_id
       |JOIN it$Iters p ON p.i = ex.i
       |GROUP BY 1""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val emb = Tables(spark, dir).embeddings
    val covRows = covariance(emb).select("i", "j", "cov").collect()
    val cq = Array.ofDim[Long](D, D)
    covRows.foreach { r =>
      val (i, j) = (r.getInt(0) - 1, r.getInt(1) - 1)
      val q = math.floor(r.getDouble(2) * ItScale.toDouble + 0.5).toLong
      cq(i)(j) = q
      cq(j)(i) = q
    }
    val (pc1, eigval) = powerIteration(cq)
    val pcLit = array(pc1.map(lit(_)): _*)
    // NULL vectors have no projection; the twin's JOIN through `ex`
    // (which excludes them) drops the same rows
    emb.filter($"embedding".isNotNull).withColumn("__pc", pcLit)
      .select($"vec_id",
        (expr(
          s"""CAST(aggregate(
             |  zip_with(transform(embedding, x -> CAST(x AS DOUBLE)), __pc,
             |    (x, w) -> CAST(floor(x * w * $MomScale + 0.5d) AS BIGINT)),
             |  CAST(0 AS BIGINT), (a, t) -> a + t) AS DOUBLE)""".stripMargin)
          / MomScale.toDouble).as("proj"),
        lit(eigval).as("eigval"))
  }

  val all: Seq[GraftQuery] = Seq(q14iEmbedCovariance, q14jPcaProject)
}
