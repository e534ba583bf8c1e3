package graft
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Single-query variant of [[Verify]] for local iteration: dump ONE
  * named query's result + its oracle SQL so a DuckDB compare can gate
  * it without re-running the whole registry.
  * Usage: runMain graft.VerifyOne <name> <sfDir> <outDir>
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftConf.tune(spark)
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries(name)(spark, sfDir).coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/$name")
    SparkEntry.oracleSql.get(name).foreach(sql =>
      Files.writeString(Paths.get(s"$outDir/$name.sql"), sql))
    // Also maintain outDir/oracle_sql.json so tools/check_oracle.py
    // can gate the dump directly — without it, single-query iteration
    // needs a hand-assembled oracle map (an r14 footgun). MERGE into
    // any existing map (a full Verify writes a 171-entry json but no
    // per-query .sql files; a rebuild from .sql alone would clobber
    // it and a later check_oracle over the dir would read vacuously
    // green). The REGISTRY is the source of truth for every merged
    // name: the r14 form rescanned the dir's .sql dumps, so in a
    // reused dir a stale dump from BEFORE an oracle-SQL edit outvoted
    // the fresher json entry (r15 ADVICE) — now any name present in
    // SparkEntry.oracleSql is refreshed from it, and .sql files stay
    // purely human-readable side output.
    // Jackson ships with Spark — no hand-rolled JSON on either side.
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val jsonPath = Paths.get(s"$outDir/oracle_sql.json")
    val merged = scala.collection.mutable.SortedMap.empty[String, String]
    if (Files.exists(jsonPath)) {
      val node = mapper.readTree(Files.readString(jsonPath))
      node.fieldNames().asScala.foreach(k => merged(k) = node.get(k).asText())
    }
    merged.keys.toSeq.foreach { k =>
      SparkEntry.oracleSql.get(k) match {
        case Some(sql) => merged(k) = sql
        // A key no longer in the registry's oracle map is a RENAMED or
        // REMOVED query (r16 ADVICE): keeping it would make a later
        // check_oracle over the reused dir fail loudly on a missing
        // dump for a query that no longer exists. Drop it, visibly.
        case None =>
          System.err.println(s"[verifyone] dropping stale oracle entry: $k")
          merged.remove(k)
      }
    }
    SparkEntry.oracleSql.get(name).foreach(sql => merged(name) = sql)
    val out = mapper.createObjectNode()
    merged.foreach { case (k, v) => out.put(k, v) }
    Files.writeString(jsonPath, mapper.writeValueAsString(out))
    spark.stop()
  }
}
