package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.queries.GraftQuery

/** Multimodal column plumbing (builder contract "Multimodal columns"):
  * image/audio/video as opaque `binary` payloads with typed metadata.
  * The image/audio codecs are absent in this environment, so the
  * DECODE step is a clearly marked deterministic STUB — but the
  * Spark-side plumbing is real and tested: binary schema, typed
  * Dataset rows, partition-preserving mapPartitions batch shape, and
  * SQL-visible metadata extraction.
  *
  * At 100 TB: payloads stay columnar parquet binary (never strings),
  * decode is a per-partition pass (mapPartitions — one codec init per
  * partition, the batch shape a vectorized/Arrow UDF would use), and
  * all metadata predicates are pushdown-able plain columns.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           width: Int, height: Int, checksum: Long)

  /** Synthesize a media table from `documents`: payload = UTF-8 bytes
    * (stand-in for encoded image/audio bytes), kind round-robins
    * modalities. Deterministic, so both engines agree.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).documents.select(
      $"doc_id".as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod($"doc_id", lit(3)) + 1).cast("int")).as("kind"),
      $"text".cast(BinaryType).as("payload"),
      $"text")
  }

  /** STUB decode: a real implementation would hand `payload` to an
    * image/audio codec here (per partition, one codec instance).
    * The deterministic fake derives "decoded" dimensions from the
    * payload hash and a checksum from the payload bytes, preserving
    * the exact batch shape a real decoder would have.
    */
  def decodeStub(rows: Iterator[MediaRow]): Iterator[MediaFeatures] = {
    // per-partition "codec init" would happen here
    rows.map { r =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(r.payload).map("%02x".format(_)).mkString
      val w = 1 + Integer.parseInt(hex.substring(0, 2), 16) % 64
      val h = 1 + Integer.parseInt(hex.substring(2, 4), 16) % 64
      val checksum = r.payload.foldLeft(0L)((a, b) => a + (b & 0xff))
      MediaFeatures(r.media_id, r.kind, r.payload.length, w, h, checksum)
    }
  }

  /** Typed mapPartitions pipeline — the real plumbing under the stub. */
  def decodeAll(spark: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select($"media_id", $"kind", $"payload").as[MediaRow]
      .mapPartitions(decodeStub _)
  }

  /** q16a — SQL-visible metadata extraction over the binary column
    * (octet_length + md5-derived dims), oracle-checked. The md5 runs
    * on the source text (DuckDB's md5 is VARCHAR-only) — same bytes.
    */
  val q16aMediaMeta: GraftQuery = GraftQuery(
    "q16a_media_meta",
    """SELECT doc_id AS media_id,
      |       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |            ELSE 'video' END AS kind,
      |       CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
      |       CAST(1 + (strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 16
      |              + strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1
      |            AS INTEGER) % 64 + 1 AS width_stub
      |FROM documents""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val m = mediaTable(spark, dir)
    m.select($"media_id", $"kind",
      octet_length($"payload").as("n_bytes"),
      ((conv(substr(md5($"text"), lit(1), lit(2)), 16, 10).cast("int") + 1)
        % 64 + 1).as("width_stub"))
  }

  /** q16b — the typed mapPartitions decode pipeline (rows-only check;
    * the stub's determinism is asserted in MultimodalSpec).
    */
  val q16bDecodeStub: GraftQuery = GraftQuery.noOracle("q16b_decode_stub") {
    (spark, dir) => decodeAll(spark, dir).toDF()
  }

  val all: Seq[GraftQuery] = Seq(q16aMediaMeta, q16bDecodeStub)
}
