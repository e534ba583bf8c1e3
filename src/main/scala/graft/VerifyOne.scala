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
    spark.stop()
  }
}
