package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off decade-up probe (r12 verdict task 4) for the two costliest
  * extension families — q13c MinHash-LSH dedup and q12y BM25
  * retrieval — at ×10 and ×100 the gate scale, printing measured
  * candidate-pair mass, shuffle bytes, spill, and wall time per
  * factor plus pairwise growth exponents
  * (ln(m₂/m₁) / ln(f₂/f₁); 1.0 = linear).
  *
  * Corpus model: DISJOINT SHARDS. Replica r shifts doc_ids by
  * r·DocShift (divisible by 101 and 7, so q12y's %101 query rule and
  * the dedup plant rules replicate exactly) and prefixes every
  * whitespace token with a replica tag, making shingle/term identity
  * replica-local. That is the honest model of a GROWING corpus — new
  * content arrives, the per-document near-dup and term-collision
  * rates stay constant — under which a correctly bucketed candidate
  * generator must grow ~linearly. Naive identical-text replication
  * would instead measure a duplication FLOOD, where k copies of one
  * doc are C(k,2) pairs under ANY LSH formulation (the k² blow-up
  * exact dedup removes upstream); that axis is pinned separately by
  * ScaleSpec's exact-×10 q13a algebra. Token tagging is a per-shard
  * bijective rename, so factor 1 reproduces the base corpus masses
  * exactly and the factor sequence is self-consistent.
  *
  * Candidate masses are measured from the queries' OWN building
  * blocks ([[graft.text.DedupQueries.minhashBandRows]] band buckets,
  * [[graft.text.TfIdfQueries.bm25Scored]] probe pairs), outside the
  * timed window, so the probe measures exactly the structures the
  * committed queries run.
  */
object ScaleDecadeProbe {

  // same constant as ScaleSpec: divisible by 101 (q12y), 7 (dedup
  // plants) and 12 (q12v moduli); far above base ids + the 1e6 plant
  private[graft] val DocShift = 84840000L

  private[graft] class StageAcc extends SparkListener {
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong
    val shuffleRecords = new java.util.concurrent.atomic.AtomicLong
    val diskSpill = new java.util.concurrent.atomic.AtomicLong
    val memSpill = new java.util.concurrent.atomic.AtomicLong
    val shuffleRead = new java.util.concurrent.atomic.AtomicLong
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val m = s.stageInfo.taskMetrics
      if (m != null) {
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shuffleRecords.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        diskSpill.addAndGet(m.diskBytesSpilled)
        memSpill.addAndGet(m.memoryBytesSpilled)
        shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      }
    }
  }

  /** Listener events are async — poll until counters go quiet. */
  private[graft] def quiesce(acc: StageAcc): Unit = {
    var last = -1L
    var same = 0
    while (same < 3) {
      val now = acc.shuffleWrite.get + acc.diskSpill.get +
        acc.shuffleRecords.get + acc.memSpill.get + acc.shuffleRead.get
      if (now == last) same += 1 else { same = 0; last = now }
      Thread.sleep(100)
    }
  }

  private[graft] def timed[T](spark: SparkSession)(f: => T): (T, Double, StageAcc) = {
    val acc = new StageAcc
    spark.sparkContext.addSparkListener(acc)
    val t0 = System.nanoTime()
    val r = f
    val wall = (System.nanoTime() - t0) / 1e9
    quiesce(acc)
    spark.sparkContext.removeSparkListener(acc)
    (r, wall, acc)
  }

  private[graft] def buildShards(
      spark: SparkSession, base: String, factor: Int, out: String): Unit = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$base/documents.parquet")
    val replicas = spark.range(factor).select($"id".as("rep"))
    docs.crossJoin(broadcast(replicas))
      .withColumn("doc_id", $"doc_id" + $"rep" * DocShift)
      .withColumn("text", array_join(
        transform(split(trim($"text"), "[ \\t\\n\\x0B\\f\\r]+"),
          t => concat(lit("r"), $"rep".cast("string"), lit("~"), t)),
        " "))
      .drop("rep")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
  }

  private[graft] def rm(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
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

    // warm codegen/JIT on the base corpus so factor-1 walls aren't
    // charged JVM startup
    graft.text.DedupQueries.q13cMinhashLsh.fn(spark, base).count()
    graft.text.TfIdfQueries.q12yBm25Topk.fn(spark, base).count()

    case class M(factor: Int, docs: Long,
      mass13c: Long, maxBucket: Long, pairs13c: Long,
      wall13c: Double, shuffle13c: Long, recs13c: Long, spill13c: Long,
      mass12y: Long, queries12y: Long, rows12y: Long,
      wall12y: Double, shuffle12y: Long, recs12y: Long, spill12y: Long)

    val results = factors.map { n =>
      val tmp = java.nio.file.Files.createTempDirectory(s"graft-probe-x$n")
      val dir = tmp.toString
      buildShards(spark, base, n, dir)
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val nDocs = docs.count()

      val (pairs13c, wall13c, acc13c) =
        timed(spark)(graft.text.DedupQueries.q13cMinhashLsh.fn(spark, dir).count())
      // bucket structure of the run above, measured outside the timed
      // window (it re-runs the signature pipeline)
      val b = graft.text.DedupQueries.minhashBandRows(spark, docs)
        .groupBy($"band_idx", $"band_val").agg(count(lit(1)).as("c"))
        .agg(sum(expr("c * (c - 1) div 2")).as("mass"), max($"c").as("maxb"))
        .head()
      val (mass13c, maxBucket) = (b.getLong(0), b.getLong(1))

      val (rows12y, wall12y, acc12y) =
        timed(spark)(graft.text.TfIdfQueries.q12yBm25Topk.fn(spark, dir).count())
      // SPARK_GRAFT_SCALE_EXPLAIN=1: dump the POST-EXECUTION (AQE
      // final) plans to stderr — the shuffle-records exponent between
      // factors is only interpretable next to the join strategies AQE
      // actually picked at each factor
      if (sys.env.get("SPARK_GRAFT_SCALE_EXPLAIN").contains("1")) {
        for ((label, q) <- Seq(
          "q13c" -> graft.text.DedupQueries.q13cMinhashLsh,
          "q12y" -> graft.text.TfIdfQueries.q12yBm25Topk)) {
          val df = q.fn(spark, dir)
          df.count()
          System.err.println(s"=== $label factor=$n final plan ===")
          System.err.println(df.queryExecution.executedPlan.toString)
        }
      }
      val scored = graft.text.TfIdfQueries.bm25Scored(spark, docs)
      val s = scored.agg(count(lit(1)).as("mass"),
        expr("count(distinct query_id)").as("nq")).head()
      val (mass12y, queries12y) = (s.getLong(0), s.getLong(1))

      rm(tmp)
      val m = M(n, nDocs, mass13c, maxBucket, pairs13c, wall13c,
        acc13c.shuffleWrite.get, acc13c.shuffleRecords.get,
        acc13c.diskSpill.get,
        mass12y, queries12y, rows12y, wall12y,
        acc12y.shuffleWrite.get, acc12y.shuffleRecords.get,
        acc12y.diskSpill.get)
      println(
        s"""{"probe":"decade","base":"$base","factor":$n,"docs":$nDocs,""" +
          s""""q13c":{"cand_mass":$mass13c,"max_bucket":$maxBucket,""" +
          s""""pairs":$pairs13c,"wall_sec":${r3(wall13c)},""" +
          s""""shuffle_bytes":${m.shuffle13c},"shuffle_records":${m.recs13c},""" +
          s""""spill_bytes":${m.spill13c}},""" +
          s""""q12y":{"cand_mass":$mass12y,"queries":$queries12y,""" +
          s""""rows":$rows12y,"wall_sec":${r3(wall12y)},""" +
          s""""shuffle_bytes":${m.shuffle12y},"shuffle_records":${m.recs12y},""" +
          s""""spill_bytes":${m.spill12y}}}""")
      m
    }

    def ex(a: Double, b: Double, fa: Int, fb: Int): Double =
      if (a <= 0 || b <= 0) Double.NaN
      else r3(math.log(b / a) / math.log(fb.toDouble / fa))
    results.sliding(2).filter(_.size == 2).foreach { case Seq(a, c) =>
      println(
        s"""{"probe":"exponents","from":${a.factor},"to":${c.factor},""" +
          s""""q13c_mass_exp":${ex(a.mass13c.toDouble, c.mass13c.toDouble, a.factor, c.factor)},""" +
          s""""q13c_shuffle_exp":${ex(a.shuffle13c.toDouble, c.shuffle13c.toDouble, a.factor, c.factor)},""" +
          s""""q13c_records_exp":${ex(a.recs13c.toDouble, c.recs13c.toDouble, a.factor, c.factor)},""" +
          s""""q13c_wall_exp":${ex(a.wall13c, c.wall13c, a.factor, c.factor)},""" +
          s""""q12y_mass_exp":${ex(a.mass12y.toDouble, c.mass12y.toDouble, a.factor, c.factor)},""" +
          s""""q12y_shuffle_exp":${ex(a.shuffle12y.toDouble, c.shuffle12y.toDouble, a.factor, c.factor)},""" +
          s""""q12y_records_exp":${ex(a.recs12y.toDouble, c.recs12y.toDouble, a.factor, c.factor)},""" +
          s""""q12y_wall_exp":${ex(a.wall12y, c.wall12y, a.factor, c.factor)}}""")
    }
    spark.stop()
  }

  private def r3(x: Double): Double = math.rint(x * 1000) / 1000
}
