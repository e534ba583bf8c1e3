package graft

import org.apache.spark.sql.functions._

import graft.text.PcaQueries

/** Fixed-point covariance + power-iteration PCA: independent driver
  * recounts, eigen-sanity, and the single-scan/shared-exchange plan
  * contract.
  */
class PcaSpec extends SparkTestBase {
  import spark.implicits._

  private val D = 64

  /** Hand vectors: only dims 1 and 2 carry signal, rest zero. */
  private def toyEmb = {
    val vecs = Seq(
      Array(0.4f, 0.2f), Array(-0.4f, -0.2f),
      Array(0.2f, 0.4f), Array(-0.2f, -0.4f))
    vecs.zipWithIndex.map { case (v, id) =>
      (id.toLong, v.padTo(D, 0.0f))
    }.toDF("vec_id", "embedding")
  }

  test("covariance matches an independent driver-side quantized recount") {
    val rows = PcaQueries.covariance(toyEmb).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r).toMap
    assert(rows.size == D * (D + 1) / 2)
    // the stored values are FLOATS — recount from the float-rounded
    // doubles (0.4f.toDouble ≠ 0.4), exactly as the operator reads them
    val data = Seq(
      Array(0.4f, 0.2f), Array(-0.4f, -0.2f),
      Array(0.2f, 0.4f), Array(-0.2f, -0.4f))
    def sxy(i: Int, j: Int) =
      data.map(v => math.floor(
        v(i - 1).toDouble * v(j - 1).toDouble * 1e12 + 0.5).toLong).sum
    for (i <- 1 to 2; j <- i to 2) {
      val r = rows((i, j))
      assert(r.getLong(2) == sxy(i, j), s"s_xy($i,$j)")
      // means are exactly zero here, so cov = s_xy/1e12/n
      assert(math.abs(r.getDouble(6) - sxy(i, j) / 1e12 / 4) < 1e-15)
    }
    assert(rows((5, 9)).getLong(2) == 0L, "zero dims have zero moments")
  }

  test("power iteration finds the dominant eigenvector of a planted matrix") {
    // diag-dominant planted 2×2 block: dominant eigenvector of
    // [[3,1],[1,3]] (rest zero) is (1,1)/sqrt(2), eigenvalue 4
    val cq = Array.ofDim[Long](D, D)
    val s = 1e15
    cq(0)(0) = (3e-3 * s).toLong; cq(1)(1) = (3e-3 * s).toLong
    cq(0)(1) = (1e-3 * s).toLong; cq(1)(0) = (1e-3 * s).toLong
    val (v, lambda) = PcaQueries.powerIteration(cq)
    assert(math.abs(lambda - 4e-3) < 1e-6, s"eigenvalue $lambda")
    assert(math.abs(v(0) - v(1)) < 1e-6 &&
      math.abs(v(0) - math.sqrt(0.5)) < 1e-6, s"v=(${v(0)},${v(1)})")
    assert(v.drop(2).forall(math.abs(_) < 1e-9))
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9, "unit norm")
  }

  test("q14j projections re-derive from the component on real data") {
    val emb = Tables(spark, sfDir).embeddings
    val covRows = PcaQueries.covariance(emb).select("i", "j", "cov").collect()
    val cq = Array.ofDim[Long](D, D)
    covRows.foreach { r =>
      val q = math.floor(r.getDouble(2) * 1e15 + 0.5).toLong
      cq(r.getInt(0) - 1)(r.getInt(1) - 1) = q
      cq(r.getInt(1) - 1)(r.getInt(0) - 1) = q
    }
    val (pc1, lambda) = PcaQueries.powerIteration(cq)
    assert(lambda > 0 && math.abs(pc1.map(x => x * x).sum - 1.0) < 1e-9)
    val out = PcaQueries.q14jPcaProject.fn(spark, sfDir)
    val got = out.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val raw = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    assert(got.keySet == raw.keySet)
    raw.foreach { case (id, x) =>
      val s = x.indices.map(i =>
        math.floor(x(i).toDouble * pc1(i) * 1e12 + 0.5).toLong).sum
      assert(math.abs(got(id) - s.toDouble / 1e12) < 1e-12, s"vec $id")
    }
    // projections onto a real component must actually vary
    assert(got.values.toSet.size > got.size / 2)
  }

  test("covariance consumers read the staged moments, never the corpus") {
    // the single corpus scan happens inside the eager localCheckpoint
    // of the d(d+3)/2-row moment aggregate; every downstream consumer
    // (p2 + both broadcast m1 sides) must read that staged RDD — a
    // parquet scan in the final plan means a consumer re-derived the
    // corpus subtree (the 3-consumer reuse race the r7 verdict flagged)
    val df = PcaQueries.covariance(Tables(spark, sfDir).embeddings)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 0, s"a consumer re-scanned the corpus:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }
}
