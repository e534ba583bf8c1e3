package graft

import org.apache.spark.sql.SparkSession

/** Global ratchet: every registered query must survive a DEGENERATE
  * warehouse — zero rows, and a near-empty 3-row slice — without a
  * runtime error. The r10 advice found exactly this class of latent
  * bug (q9r: `slice(arr, 2, size-1)` throws on an all-censored input
  * while the DuckDB twin returns an empty frame — an engine-divergent
  * failure invisible to the sf0.01 oracle, which never feeds the
  * degenerate shape). At 100 TB the degenerate shape is not
  * hypothetical: a partition-pruned read, a filter that matches
  * nothing, or a fresh tenant's empty warehouse all hand every
  * operator zero rows, and "crashes the job" is the wrong answer.
  *
  * The sweep executes ALL of SparkEntry.queries against both dirs and
  * demands an exact match with the allowlist of queries whose
  * contract genuinely requires data (each with a documented reason) —
  * so a new crash AND a stale allowlist entry both fail the build.
  */
class DegenerateInputSpec extends SparkTestBase {

  /** Queries whose CONTRACT requires a non-empty input, with the
    * reason. Anything not listed here must run crash-free. */
  private val mayFailEmpty: Map[String, String] = Map(
    "q9j_churn_model" -> ("Spark ML RandomForest refuses an empty " +
      "training set (SparkException: ML algorithm was given empty " +
      "dataset) — a trainer that silently emitted a model from zero " +
      "examples would be the bug; loud failure is the contract"),
    "q9k_elasticity_lr" -> ("Spark ML LinearRegression asserts " +
      "non-empty training data — same contract as q9j: no model from " +
      "zero examples"))

  private val mayFailTiny: Map[String, String] = Map.empty

  private val mayFailConst: Map[String, String] = Map.empty

  private val mayFailNulls: Map[String, String] = Map(
    "q9k_elasticity_lr" -> ("all prices NULL → every price band is " +
      "filtered by avg_price > 0 → empty training set; Spark ML's " +
      "loud refusal is the contract (same as the empty-warehouse " +
      "q9j/q9k entries)"))

  private def sweep(dir: String, allow: Map[String, String]): Unit = {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, dir).collect(); None }
        catch {
          case e: Throwable =>
            Some(name -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
        }
    }.toMap
    val unexpected = failures -- allow.keySet
    val stale = allow.keySet -- failures.keySet
    assert(unexpected.isEmpty,
      s"queries crashed on degenerate input ($dir):\n" +
        unexpected.toSeq.sortBy(_._1).map { case (n, e) => s"  $n: $e" }.mkString("\n"))
    assert(stale.isEmpty,
      s"stale allowlist entries (no longer fail on $dir): $stale")
  }

  test("every registered query survives an empty warehouse") {
    sweep(DegenerateData.emptyDir(spark), mayFailEmpty)
  }

  test("every registered query survives a 3-row warehouse") {
    sweep(DegenerateData.tinyDir(spark), mayFailTiny)
  }

  test("every registered query survives a constant (zero-variance) warehouse") {
    sweep(DegenerateData.constDir(spark), mayFailConst)
  }

  test("every registered query survives an all-NULL-measures warehouse") {
    sweep(DegenerateData.nullsDir(spark), mayFailNulls)
  }
}

/** Builds the degenerate warehouse dirs once per JVM: the sf0.001
  * schema (so type normalization paths like Tables.events see the real
  * on-disk types) with 0 and 3 rows per table.
  */
object DegenerateData {
  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  private def build(spark: SparkSession, label: String, n: Int): String = {
    val root = s"target/degenerate/$label"
    val done = java.nio.file.Paths.get(root, "_BUILT")
    if (!java.nio.file.Files.exists(done)) {
      tables.foreach { t =>
        spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
          .limit(n)
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$root/$t.parquet")
      }
      java.nio.file.Files.createFile(done)
    }
    root
  }

  def emptyDir(spark: SparkSession): String = synchronized(build(spark, "empty", 0))
  def tinyDir(spark: SparkSession): String  = synchronized(build(spark, "tiny", 3))

  /** Null-measures warehouse: key/id columns intact (joins still
    * resolve), EVERY other column NULL — the dirty-feed shape. Flushed
    * five real latent crashes on first run: a getDouble on a NULL
    * covariance, a NULL-unsafe PrefixSum, two `.as[Int]` decodes of a
    * NULL-derived partition year, and an avro writer whose schema
    * lacked the nullable-union mapping.
    */
  def nullsDir(spark: SparkSession): String = synchronized {
    import org.apache.spark.sql.functions.{col, lit}
    val keep = Set("l_linenumber", "event_id", "user_id", "doc_id", "vec_id")
    val root = "target/degenerate/nulls"
    val done = java.nio.file.Paths.get(root, "_BUILT")
    if (!java.nio.file.Files.exists(done)) {
      tables.foreach { t =>
        val df = spark.read
          .parquet(s"/root/testdata/sf0.001/$t.parquet").limit(3)
        val cols = df.schema.fields.map { f =>
          if (f.name.endsWith("key") || keep(f.name)) col(f.name)
          else lit(null).cast(f.dataType).as(f.name)
        }
        df.select(cols.toIndexedSeq: _*).coalesce(1)
          .write.mode("overwrite").parquet(s"$root/$t.parquet")
      }
      java.nio.file.Files.createFile(done)
    }
    root
  }

  /** Constant warehouse: ONE distinct row per table, replicated ×8 —
    * zero variance in every measure and a single value in every key.
    * The shape a constant column or an all-one-key partition hands
    * every variance/quantile/ratio formula at scale.
    */
  def constDir(spark: SparkSession): String = synchronized {
    val root = "target/degenerate/const"
    val done = java.nio.file.Paths.get(root, "_BUILT")
    if (!java.nio.file.Files.exists(done)) {
      tables.foreach { t =>
        val one = spark.read
          .parquet(s"/root/testdata/sf0.001/$t.parquet").limit(1)
        List.fill(8)(one).reduce(_ unionAll _)
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$root/$t.parquet")
      }
      java.nio.file.Files.createFile(done)
    }
    root
  }
}
