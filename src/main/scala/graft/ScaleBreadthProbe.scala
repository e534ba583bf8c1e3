package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Breadth companion to [[ScaleDecadeProbe]] (r13): decade-up
  * measurements for the THREE remaining scale-critical extension
  * families the r12/r13 probe did not cover —
  *
  *   - q13b n-gram Jaccard: candidate mass = Σ C(|capped posting|, 2)
  *     over the shingle inverted index (the DF cap bounds every term);
  *   - q13f connected components: propagation ROUNDS (must stay
  *     constant — a growing near-dup corpus multiplies components,
  *     not diameters) plus per-round shuffle mass;
  *   - q14c IVF ANN: per-query probe mass = Σ over the fixed query
  *     batch of (home-cell size − 1). ivfK pins the MEAN cell near
  *     128 vectors however far the corpus grows, so probe mass must
  *     SATURATE at ~|queries|·128 (exponent → 0), while the
  *     assignment shuffle stays one row per vector (linear). The
  *     O(N·k) assignment compute is the known flat-quantizer
  *     index-BUILD cost (map-side over a broadcast centroid table, no
  *     shuffle amplification) — reported, not hidden.
  *
  * Corpus models. Documents reuse [[ScaleDecadeProbe.buildShards]]'
  * DISJOINT SHARDS (replica-tagged tokens, id-shifted docs — constant
  * per-doc dup rates, the honest growing-corpus model; see that
  * scaladoc for why identical-text replication would instead measure
  * a duplication flood). Embeddings get the geometric analogue: each
  * replica applies an ISOMETRY of R^64 — a circular dimension shift
  * by (rep mod d) composed with per-dimension sign flips drawn from
  * hash(rep, i) — so every shard preserves the base corpus's
  * intra-shard neighbor structure EXACTLY (dot, norm, and cosine are
  * invariant under coordinate permutation + sign flips applied to
  * both vectors), while cross-shard similarities are pseudo-random
  * "new content". Replica 0 is the identity, so factor 1 reproduces
  * the base corpus bit-for-bit and the factor sequence is
  * self-consistent. Queries stay the contract's fixed vec_id < 50
  * batch (all in replica 0): a query BATCH does not grow with the
  * corpus, which is exactly the regime the q14c scaladoc claims.
  */
object ScaleBreadthProbe {

  private val VecShift = 10000000L

  /** Isometric embedding shards: vec_id += rep·VecShift,
    * y_i = s(rep,i) · x_((i+rep) mod d), s = ±1 from hash(rep, i),
    * identity at rep 0.
    */
  private[graft] def buildEmbShards(
      spark: SparkSession, base: String, factor: Int, out: String): Unit = {
    import spark.implicits._
    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    val d = emb.select(size($"embedding")).head().getInt(0)
    val replicas = spark.range(factor).select($"id".as("rep"))
    emb.crossJoin(broadcast(replicas))
      .withColumn("embedding",
        when($"rep" === 0, $"embedding").otherwise(
          transform(sequence(lit(0), lit(d - 1)), i =>
            (when(pmod(hash($"rep", i), lit(2)) === 0, lit(1.0f))
              .otherwise(lit(-1.0f)) *
              element_at($"embedding", (pmod(i + $"rep", lit(d)) + 1)
                .cast("int"))).cast("float"))))
      .withColumn("vec_id", $"vec_id" + $"rep" * VecShift)
      .drop("rep")
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SCALE_BASE", "/root/testdata/sf0.01")
    val factors = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTORS", "1,10,100")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftConf.tune(spark)
    import spark.implicits._
    import ScaleDecadeProbe.{buildShards, rm, timed}

    // warm codegen/JIT on the base corpus so factor-1 walls aren't
    // charged JVM startup
    graft.text.DedupQueries.q13bNgramJaccard.fn(spark, base).count()
    graft.text.DedupQueries.q13fDedupComponents.fn(spark, base).count()
    graft.text.SimilarityQueries.q14cAnnIvf.fn(spark, base).count()

    case class M(factor: Int, docs: Long, vecs: Long,
      mass13b: Long, maxPost: Long, pairs13b: Long,
      wall13b: Double, shuffle13b: Long, recs13b: Long, spill13b: Long,
      rounds13f: Int, comps13f: Long, verts13f: Long,
      wall13f: Double, shuffle13f: Long, recs13f: Long, spill13f: Long,
      k14c: Int, qmass14c: Long, maxCell: Long, meanCell: Double,
      rows14c: Long,
      wall14c: Double, shuffle14c: Long, recs14c: Long, spill14c: Long)

    val results = factors.map { n =>
      val tmp = java.nio.file.Files.createTempDirectory(s"graft-breadth-x$n")
      val dir = tmp.toString
      buildShards(spark, base, n, dir)
      buildEmbShards(spark, base, n, dir)
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val nDocs = docs.count()
      val nVecs = spark.read.parquet(s"$dir/embeddings.parquet").count()

      // ---- q13b: timed pair query, then inverted-index mass from the
      // query's own building block (cappedPostings), outside the window
      val (pairs13b, wall13b, acc13b) = timed(spark)(
        graft.text.DedupQueries.q13bNgramJaccard.fn(spark, dir).count())
      val pRow = graft.text.DedupQueries.cappedPostings(spark, docs)
        .select(size($"ds").cast("long").as("k"))
        .agg(sum(expr("k * (k - 1) div 2")).as("mass"), max($"k").as("maxp"))
        .head()
      val (mass13b, maxPost) = (pRow.getLong(0), pRow.getLong(1))

      // ---- q13f: timed pairs → min-label propagation; rounds from the
      // operator itself (componentsWithRounds is what q13f composes)
      val pairs = graft.text.DedupQueries.q13bNgramJaccard.fn(spark, dir)
        .select($"doc_a", $"doc_b")
      val ((labels, rounds13f, verts13f), wall13f, acc13f) = timed(spark) {
        val (l, r) = graft.operators.ConnectedComponents
          .componentsWithRounds(pairs)
        (l, r, l.count())
      }
      val comps13f = labels.select(countDistinct($"component")).head().getLong(0)

      // ---- q14c: timed IVF top-3, then cell structure + probe mass in
      // ONE pass over the query's own assignment (assignCells)
      val (rows14c, wall14c, acc14c) = timed(spark)(
        graft.text.SimilarityQueries.q14cAnnIvf.fn(spark, dir).count())
      val v = spark.read.parquet(s"$dir/embeddings.parquet")
        .select($"vec_id", $"embedding",
          graft.functions.VectorOps.norm2($"embedding").as("n2"))
        .filter($"n2" > 0)
      val k14c = graft.text.SimilarityQueries.ivfK(nVecs)
      val cRow = graft.text.SimilarityQueries.assignCells(v, k14c)
        .groupBy($"cell")
        .agg(count(lit(1)).as("csz"),
          sum(when($"vec_id" < 50, 1L).otherwise(0L)).as("nq"))
        .agg(sum($"nq" * ($"csz" - 1)).as("qmass"), max($"csz").as("maxc"),
          avg($"csz").as("meanc"))
        .head()
      val (qmass14c, maxCell, meanCell) =
        (cRow.getLong(0), cRow.getLong(1), cRow.getDouble(2))

      rm(tmp)
      val m = M(n, nDocs, nVecs,
        mass13b, maxPost, pairs13b, wall13b,
        acc13b.shuffleWrite.get, acc13b.shuffleRecords.get, acc13b.diskSpill.get,
        rounds13f, comps13f, verts13f, wall13f,
        acc13f.shuffleWrite.get, acc13f.shuffleRecords.get, acc13f.diskSpill.get,
        k14c, qmass14c, maxCell, meanCell, rows14c, wall14c,
        acc14c.shuffleWrite.get, acc14c.shuffleRecords.get, acc14c.diskSpill.get)
      println(
        s"""{"probe":"breadth","base":"$base","factor":$n,"docs":$nDocs,"vecs":$nVecs,""" +
          s""""q13b":{"cand_mass":$mass13b,"max_posting":$maxPost,""" +
          s""""pairs":$pairs13b,"wall_sec":${r3(wall13b)},""" +
          s""""shuffle_bytes":${m.shuffle13b},"shuffle_records":${m.recs13b},""" +
          s""""spill_bytes":${m.spill13b}},""" +
          s""""q13f":{"rounds":$rounds13f,"components":$comps13f,""" +
          s""""vertices":$verts13f,"wall_sec":${r3(wall13f)},""" +
          s""""shuffle_bytes":${m.shuffle13f},"shuffle_records":${m.recs13f},""" +
          s""""spill_bytes":${m.spill13f}},""" +
          s""""q14c":{"k":$k14c,"query_probe_mass":$qmass14c,""" +
          s""""max_cell":$maxCell,"mean_cell":${r3(meanCell)},""" +
          s""""rows":$rows14c,"wall_sec":${r3(wall14c)},""" +
          s""""shuffle_bytes":${m.shuffle14c},"shuffle_records":${m.recs14c},""" +
          s""""spill_bytes":${m.spill14c}}}""")
      m
    }

    def ex(a: Double, b: Double, fa: Int, fb: Int): Double =
      if (a <= 0 || b <= 0) Double.NaN
      else r3(math.log(b / a) / math.log(fb.toDouble / fa))
    results.sliding(2).filter(_.size == 2).foreach { case Seq(a, c) =>
      println(
        s"""{"probe":"exponents","from":${a.factor},"to":${c.factor},""" +
          s""""q13b_mass_exp":${ex(a.mass13b.toDouble, c.mass13b.toDouble, a.factor, c.factor)},""" +
          s""""q13b_shuffle_exp":${ex(a.shuffle13b.toDouble, c.shuffle13b.toDouble, a.factor, c.factor)},""" +
          s""""q13b_records_exp":${ex(a.recs13b.toDouble, c.recs13b.toDouble, a.factor, c.factor)},""" +
          s""""q13f_rounds_delta":${c.rounds13f - a.rounds13f},""" +
          s""""q13f_shuffle_exp":${ex(a.shuffle13f.toDouble, c.shuffle13f.toDouble, a.factor, c.factor)},""" +
          s""""q13f_records_exp":${ex(a.recs13f.toDouble, c.recs13f.toDouble, a.factor, c.factor)},""" +
          s""""q14c_probe_mass_exp":${ex(a.qmass14c.toDouble, c.qmass14c.toDouble, a.factor, c.factor)},""" +
          s""""q14c_records_exp":${ex(a.recs14c.toDouble, c.recs14c.toDouble, a.factor, c.factor)},""" +
          s""""q14c_wall_exp":${ex(a.wall14c, c.wall14c, a.factor, c.factor)}}""")
    }
    spark.stop()
  }

  private def r3(x: Double): Double = math.rint(x * 1000) / 1000
}
