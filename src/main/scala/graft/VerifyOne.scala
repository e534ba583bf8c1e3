package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

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
    // needs a hand-assembled oracle map (an r14 footgun). Rebuilt
    // from the per-query .sql files in the dir (the dumps this main
    // itself writes), so repeated VerifyOne calls into one dir merge
    // without parsing JSON back.
    val sqls = java.nio.file.Files.list(Paths.get(outDir)).iterator()
    val merged = scala.collection.mutable.SortedMap.empty[String, String]
    while (sqls.hasNext) {
      val p = sqls.next()
      val fn = p.getFileName.toString
      if (fn.endsWith(".sql"))
        merged(fn.stripSuffix(".sql")) = Files.readString(p)
    }
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      merged.toSeq
        .map { case (k, v) => s""""${escape(k)}":"${escape(v)}"""" }
        .mkString("{", ",", "}"))
    spark.stop()
  }

  private def escape(s: String): String =
    s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

}
