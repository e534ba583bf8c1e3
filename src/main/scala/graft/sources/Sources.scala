package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.queries.GraftQuery

/** Source/sink surface (SURVEY §2.1): schema-declared CSV ingestion
  * with error capture (S1 + S6), semi-structured JSON column parsing,
  * and the physical-layout writers the 100 TB story depends on —
  * date-partitioned parquet (partition pruning) and bucketed tables
  * (co-located joins with no shuffle). Writers are exercised in
  * SourcesSpec, where the bucketed-join plan is asserted Exchange-free.
  */
object Sources {

  /** Schema-declared CSV read, mirroring Kettle CsvInput's contract
    * (explicit column types, header, quote enclosure, UTF-8 — e.g.
    * `ETL/ETL for delivery.ktr:562-680`): PERMISSIVE mode captures
    * malformed rows in `_corrupt_record` instead of failing the load,
    * which is the source-side analog of the reference's error sink.
    */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", StringType))
      .option("header", "true")
      .option("quote", "\"")
      .option("encoding", "UTF-8")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)

  /** Date-partitioned parquet: partition pruning at read time is the
    * index substitute at 100 TB (SURVEY §4).
    */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Bucketed table: both sides bucketed on the join key → sort-merge
    * join with NO exchange (asserted in SourcesSpec). The plain-
    * parquet co-location strategy for repeated fact⋈fact joins.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Compaction-aware write: bound file count and rows-per-file so a
    * 100 TB table neither fragments into millions of small files nor
    * concentrates into unsplittable monoliths. Pair with
    * [[writePartitioned]]'s date partitioning for pruning.
    */
  def writeCompacted(df: DataFrame, path: String, targetFileRows: Long,
                     approxRows: Long): Unit = {
    val files = math.max(1, (approxRows.toDouble / targetFileRows).ceil.toInt)
    df.repartition(files)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", targetFileRows)
      .parquet(path)
  }

  /** Z-ordered write: range-partition by the Morton interleave of two
    * normalized columns ([[graft.functions.ZOrder]]), one file per
    * range — every file then covers a small RECTANGLE of the (a, b)
    * space, so min/max skipping prunes files for predicates on EITHER
    * column (a single-column sort leaves the other column full-range
    * in every file; SourcesSpec asserts the comparison). The caller
    * supplies each column's bounds, as table stats would at scale.
    */
  def writeZOrdered(df: DataFrame, path: String,
                    colA: String, boundsA: (Double, Double),
                    colB: String, boundsB: (Double, Double),
                    files: Int): Unit = {
    import graft.functions.ZOrder
    // the temp column is appended then stripped — a collision would
    // silently drop the caller's data from the written files
    require(!df.columns.contains("__z"),
      "input must not contain a column named __z")
    val z = ZOrder.interleave(
      ZOrder.normalize(col(colA), boundsA._1, boundsA._2),
      ZOrder.normalize(col(colB), boundsB._1, boundsB._2))
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** q17a — semi-structured JSON column parse: events.props →
    * typed field + aggregation (get_json_object / from_json).
    */
  val q17aJsonProps: GraftQuery = GraftQuery(
    "q17a_json_props",
    """SELECT event_type,
      |       CAST(json_extract_string(props, '$.k') AS INTEGER) % 10
      |         AS k_bucket,
      |       COUNT(*) AS n,
      |       CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
      |         AS total_value
      |FROM events
      |GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val events = Tables(spark, dir).events
    events
      .select($"event_type",
        (get_json_object($"props", "$.k").cast(IntegerType) % 10)
          .as("k_bucket"),
        $"value")
      .groupBy($"event_type", $"k_bucket")
      .agg(count(lit(1)).as("n"),
        graft.functions.Exact.dsum($"value").as("total_value"))
  }

  /** Fixed (per-machine-tmpdir) roundtrip output roots: the DuckDB
    * oracle must read the very files Spark wrote, so the path is
    * deterministic and baked into the oracle SQL at object init (both
    * sides run on the same host — the driver runs Verify first, then
    * the oracles).
    */
  private val RoundtripRoot: String =
    sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft_roundtrip"
  private val CsvOut = s"$RoundtripRoot/q17b_csv"
  private val JsonlOut = s"$RoundtripRoot/q17c_jsonl"

  /** Plant one malformed line (plus header for CSV) as an extra data
    * file in `dir` AFTER the Spark write cleared it — both engines
    * must then exclude exactly that line for the hash gate to pass:
    * Spark via PERMISSIVE `_corrupt_record` capture, DuckDB via
    * `ignore_errors` (CSV) / all-NULL-row filter (JSONL).
    */
  private def plantCorrupt(dir: String, fileName: String,
                           lines: Seq[String]): Unit = {
    val p = java.nio.file.Paths.get(dir, fileName)
    java.nio.file.Files.write(p,
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))
  }

  /** q17b — schema-declared CSV round trip, ORACLE-GATED: a
    * deterministic slice of lineitem written to CSV (fixed path), one
    * malformed line planted alongside, read back through [[csv]] in
    * PERMISSIVE mode, corrupt captures excluded. The DuckDB twin
    * `read_csv`s the same files with `ignore_errors` — the hash match
    * proves BOTH value-level format parity and that the corrupt line
    * was captured (a missed capture surfaces as a null-filled extra
    * row and fails the gate). Ref contract: Kettle CsvInput + error
    * sink, `ETL/etl for customer with scd2.ktr:1072-1140`.
    */
  val q17bCsvRoundtrip: GraftQuery = GraftQuery(
    "q17b_csv_roundtrip",
    s"""SELECT * FROM read_csv('$CsvOut/*.csv', header=true,
       |  columns={'l_orderkey':'BIGINT','l_linenumber':'INTEGER',
       |           'l_quantity':'DOUBLE','l_returnflag':'VARCHAR'},
       |  ignore_errors=true)""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val slice = Tables(spark, dir).lineitem
      .filter($"l_orderkey" % 100 === 0)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity",
        $"l_returnflag")
    slice.write.mode("overwrite").option("header", "true").csv(CsvOut)
    plantCorrupt(CsvOut, "zz_corrupt.csv",
      Seq("l_orderkey,l_linenumber,l_quantity,l_returnflag",
        "notanumber,xyz,bad,Z"))
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType),
      StructField("l_returnflag", StringType)))
    // Eager localCheckpoint: a pruned downstream query (count(),
    // select of no data columns) would otherwise push a scan that
    // references ONLY _corrupt_record, which Spark rejects at plan
    // time (QUERY_ONLY_CORRUPT_RECORD_COLUMN — surfaced by the
    // full-registry bench, whose count() tripped it). Materializing
    // the slice-sized parse result decouples every consumer from the
    // corrupt-column scan; no CacheManager entry (CacheSpec rule).
    csv(spark, CsvOut, schema)
      .filter($"_corrupt_record".isNull)
      .drop("_corrupt_record")
      .localCheckpoint(true)
  }

  /** q17c — JSONL round trip, ORACLE-GATED: the de-facto
    * training-corpus exchange format (one JSON document per line). A
    * deterministic documents slice writes to a fixed path, one invalid
    * JSON line is planted, and the read-back is schema-declared
    * PERMISSIVE with corrupt-line capture excluded. The DuckDB twin
    * `read_json`s the same files; its `ignore_errors` NULLs (not
    * drops) the bad line, so the twin filters `doc_id IS NOT NULL` —
    * the same exclusion Spark reaches via `_corrupt_record` (doc_id
    * is never NULL in well-formed documents rows). SourcesSpec
    * additionally asserts the captured raw line verbatim.
    */
  val q17cJsonlRoundtrip: GraftQuery = GraftQuery(
    "q17c_jsonl_roundtrip",
    s"""SELECT * FROM read_json('$JsonlOut/*.json',
       |  format='newline_delimited',
       |  columns={'doc_id':'BIGINT','text':'VARCHAR',
       |           'lang':'VARCHAR','n_chars':'BIGINT'},
       |  ignore_errors=true)
       |WHERE doc_id IS NOT NULL""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val slice = Tables(spark, dir).documents
      .filter($"doc_id" % 10 === 0)
      .select($"doc_id", $"text", $"lang", $"n_chars")
    slice.write.mode("overwrite").json(JsonlOut)
    plantCorrupt(JsonlOut, "zz_corrupt.json",
      Seq("{\"doc_id\": this is not json}"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("n_chars", LongType),
      StructField("_corrupt_record", StringType)))
    // same QUERY_ONLY_CORRUPT_RECORD_COLUMN decoupling as q17b
    spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(JsonlOut)
      .filter($"_corrupt_record".isNull)
      .drop("_corrupt_record")
      .localCheckpoint(true)
  }

  private val OrcOut = s"$RoundtripRoot/q17d_orc"

  /** q17d — ORC round trip, ORACLE-GATED without DuckDB reading ORC
    * (it cannot): the gate is in-plan. A deterministic lineitem slice
    * (bigint/int/double/date/varchar columns (incl. l_linestatus) — the type spread ORC
    * must preserve bit-for-bit) writes to ORC and reads back; the
    * output carries (a) per-flag row counts and EXACT decimal
    * quantity sums computed FROM THE READ-BACK, and (b) two
    * `exceptAll` cardinalities between read-back and source — a
    * full-row, every-column multiset equivalence, not a sampled or
    * aggregate-only check. The DuckDB twin computes the same
    * aggregates straight from the parquet table with literal-zero
    * mismatch columns: any value ORC mangles (a flipped double bit, a
    * shifted date, a truncated string) surfaces either as an aggregate
    * divergence or a nonzero exceptAll count, and the hash gate
    * fails. Dates cross the output boundary as ISO strings (driver
    * dtype parity).
    */
  val q17dOrcRoundtrip: GraftQuery = GraftQuery(
    "q17d_orc_roundtrip",
    """SELECT l_returnflag,
      |       CAST(COUNT(*) AS BIGINT) AS n_rows,
      |       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR)
      |            AS DOUBLE) AS total_qty,
      |       CAST(MAX(l_shipdate) AS VARCHAR) AS max_ship,
      |       CAST(0 AS BIGINT) AS n_extra,
      |       CAST(0 AS BIGINT) AS n_missing
      |FROM lineitem
      |WHERE l_orderkey % 100 = 0
      |GROUP BY 1""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val slice = Tables(spark, dir).lineitem
      .filter($"l_orderkey" % 100 === 0)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity",
        $"l_returnflag", $"l_shipdate", $"l_linestatus")
    slice.write.mode("overwrite").orc(OrcOut)
    val back = spark.read.orc(OrcOut).localCheckpoint(true)
    // full-row multiset equivalence, both directions
    val extra = back.exceptAll(slice).agg(count(lit(1)).as("n_extra"))
    val missing = slice.exceptAll(back).agg(count(lit(1)).as("n_missing"))
    back.groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        graft.functions.Exact.dsum($"l_quantity").as("total_qty"),
        max($"l_shipdate").cast(StringType).as("max_ship"))
      .crossJoin(broadcast(extra))
      .crossJoin(broadcast(missing))
  }

  val all: Seq[GraftQuery] =
    Seq(q17aJsonProps, q17bCsvRoundtrip, q17cJsonlRoundtrip,
      q17dOrcRoundtrip)
}
