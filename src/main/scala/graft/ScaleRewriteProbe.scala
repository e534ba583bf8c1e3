package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decade-up RUN evidence for the two r13 fold/shape rewrites the
  * decade and breadth probes do not cover (SURVEY §8.11 ledgered the
  * rewrites with plan ratchets; this main adds the measured
  * exponents, the same evidence standard the q13b/q13f/q14c families
  * got in [[ScaleBreadthProbe]]):
  *
  *   - q14h k-means step: the argmin assignment is a per-row fold
  *     over a broadcast centroid array (zero shuffle, zero per-key
  *     state — the crossJoin + min(struct) groupBy it replaced
  *     external-sorted the N·k fan-out), and the centroid-mean
  *     explode is bounded by k·64 map-side partials per task. So
  *     shuffle RECORDS must grow ~linearly in N (the per-doc
  *     signature/assignment rows), never ~N·k, and spill must stay
  *     zero. k itself grows as ivfK(N) ≈ N/128, so the broadcast
  *     centroid array is the documented flat-quantizer envelope —
  *     reported per factor, not hidden.
  *
  *   - q13d SimHash: per-(token, bit) rows → one hash aggregation
  *     (the r13 rewrite killed a token×bit crossJoin shape). The
  *     16-bit fan-out is a CONSTANT factor, so shuffle records must
  *     stay ~linear in corpus tokens and the wall exponent ≈ 1.
  *
  * Corpus models reuse the probes' shard builders: disjoint
  * replica-tagged doc shards (q13d) and isometric embedding shards
  * (q14h) — see their scaladocs for why identical-text replication
  * would measure the wrong thing. Factors default to 1,10,100 on
  * sf0.01 (x100 ≈ the sf1 row count). Not part of the driver
  * contract.
  *
  * Usage: java -cp target/scala-2.13/classes:/opt/spark/jars/\*
  *        graft.ScaleRewriteProbe   (env: SPARK_GRAFT_SCALE_BASE,
  *        SPARK_GRAFT_SCALE_FACTORS, SPARK_GRAFT_CPUS)
  */
object ScaleRewriteProbe {
  private def r3(d: Double): Double = math.rint(d * 1000) / 1000

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
    import ScaleDecadeProbe.{buildShards, rm, timed}
    import ScaleBreadthProbe.buildEmbShards

    // warm codegen/JIT on the base corpus
    graft.text.DedupQueries.q13dSimhash.fn(spark, base).count()
    graft.text.KMeansQueries.q14hKmeansStep.fn(spark, base).count()

    case class M(factor: Int, docs: Long, vecs: Long,
      rows13d: Long, wall13d: Double, shuffle13d: Long, recs13d: Long,
      spill13d: Long,
      k14h: Int, rows14h: Long, wall14h: Double, shuffle14h: Long,
      recs14h: Long, spill14h: Long)

    val results = factors.map { n =>
      val tmp = java.nio.file.Files.createTempDirectory(s"graft-rewrite-x$n")
      val dir = tmp.toString
      buildShards(spark, base, n, dir)
      buildEmbShards(spark, base, n, dir)
      val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
      val nVecs = spark.read.parquet(s"$dir/embeddings.parquet").count()

      val (rows13d, wall13d, acc13d) = timed(spark)(
        graft.text.DedupQueries.q13dSimhash.fn(spark, dir).count())

      val k14h = graft.text.SimilarityQueries.ivfK(nVecs)
      val (rows14h, wall14h, acc14h) = timed(spark)(
        graft.text.KMeansQueries.q14hKmeansStep.fn(spark, dir).count())

      rm(tmp)
      val m = M(n, nDocs, nVecs,
        rows13d, wall13d, acc13d.shuffleWrite.get,
        acc13d.shuffleRecords.get, acc13d.diskSpill.get,
        k14h, rows14h, wall14h, acc14h.shuffleWrite.get,
        acc14h.shuffleRecords.get, acc14h.diskSpill.get)
      println(
        s"""{"probe":"rewrite","base":"$base","factor":$n,""" +
          s""""docs":$nDocs,"vecs":$nVecs,""" +
          s""""q13d":{"rows":$rows13d,"wall_sec":${r3(wall13d)},""" +
          s""""shuffle_bytes":${m.shuffle13d},""" +
          s""""shuffle_records":${m.recs13d},"spill_bytes":${m.spill13d}},""" +
          s""""q14h":{"k":$k14h,"rows":$rows14h,"wall_sec":${r3(wall14h)},""" +
          s""""shuffle_bytes":${m.shuffle14h},""" +
          s""""shuffle_records":${m.recs14h},"spill_bytes":${m.spill14h}}}""")
      m
    }

    def ex(a: Double, b: Double, fa: Int, fb: Int): Double =
      if (a <= 0 || b <= 0) Double.NaN
      else r3(math.log(b / a) / math.log(fb.toDouble / fa))
    results.sliding(2).filter(_.size == 2).foreach { case Seq(a, c) =>
      println(
        s"""{"probe":"rewrite_exponents","from":${a.factor},"to":${c.factor},""" +
          s""""q13d_wall_exp":${ex(a.wall13d, c.wall13d, a.factor, c.factor)},""" +
          s""""q13d_records_exp":${ex(a.recs13d.toDouble, c.recs13d.toDouble, a.factor, c.factor)},""" +
          s""""q13d_spill":[${a.spill13d},${c.spill13d}],""" +
          s""""q14h_wall_exp":${ex(a.wall14h, c.wall14h, a.factor, c.factor)},""" +
          s""""q14h_records_exp":${ex(a.recs14h.toDouble, c.recs14h.toDouble, a.factor, c.factor)},""" +
          s""""q14h_spill":[${a.spill14h},${c.spill14h}]}""")
    }
    spark.stop()
  }
}
