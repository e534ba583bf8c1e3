package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Registry-wide spill census (SURVEY §8.11 cadence, committed r14 so
  * the measurement is repeatable instead of ad hoc): execute every
  * registered query at the bench scale factor under a stage listener
  * and report shuffle volume and memory/disk spill. The engine's
  * zero-spill claim at sf0.1 — every operator's working set fits the
  * 32-way partitioning — is what this main re-measures each round;
  * any nonzero per-query spill delta names the query to chase.
  *
  * q15* (streaming batch-twins) are excluded as always: their real
  * readStream execution is driven by StreamingSpec, and the twin
  * bodies re-run identical batch plans already timed elsewhere.
  *
  * Attribution caveat: listener events post asynchronously, so
  * per-query deltas drain on a short post-query sleep — totals are
  * exact, attribution is best-effort (ties break toward the LATER
  * query). Not part of the driver contract.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32
  *        java -cp target/scala-2.13/classes:/opt/spark/jars/\*
  *        graft.SpillCensus
  */
object SpillCensus {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftConf.tune(spark)

    val memSpill = new AtomicLong
    val diskSpill = new AtomicLong
    val shufRead = new AtomicLong
    val shufWrite = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        memSpill.addAndGet(m.memoryBytesSpilled)
        diskSpill.addAndGet(m.diskBytesSpilled)
        shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })

    val names = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.startsWith("q15"))
    val t0 = System.nanoTime()
    var failed = List.empty[String]
    val spilled = names.flatMap { n =>
      val m0 = memSpill.get; val d0 = diskSpill.get
      try SparkEntry.queries(n)(spark, sfDir).count()
      catch { case t: Throwable =>
        failed ::= n
        System.err.println(s"CENSUS FAILURE $n: ${t.getMessage}")
      }
      Thread.sleep(100) // drain the async listener bus (attribution only)
      val dm = memSpill.get - m0; val dd = diskSpill.get - d0
      if (dm > 0 || dd > 0)
        Some(s""""$n":{"mem_spill":$dm,"disk_spill":$dd}""")
      else None
    }
    Thread.sleep(500)
    val wall = (System.nanoTime() - t0) / 1e9
    println(
      s"""{"metric":"spill_census","n_queries":${names.size},""" +
        s""""failed":[${failed.reverse.map("\"" + _ + "\"").mkString(",")}],""" +
        s""""wall_s":$wall,""" +
        s""""shuffle_read_bytes":${shufRead.get},""" +
        s""""shuffle_write_bytes":${shufWrite.get},""" +
        s""""mem_spill_bytes":${memSpill.get},""" +
        s""""disk_spill_bytes":${diskSpill.get},""" +
        s""""spilled_queries":{${spilled.mkString(",")}},""" +
        s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
