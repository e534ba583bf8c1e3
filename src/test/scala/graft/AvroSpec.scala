package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.AvroSources

/** Reader-level checks for the avro-core source (q17l) beyond the
  * roundtrip hash gate: genuine container bytes on disk, declared-
  * schema pruning, and the loud-failure contract (silent nulls or
  * skipped files would pass row-count checks while corrupting data).
  */
class AvroSpec extends SparkTestBase {

  private val out = java.nio.file.Files
    .createTempDirectory("avro_spec").toString

  private val schemaJson =
    """{"type":"record","name":"r","fields":[
      |  {"name":"k","type":"long"},
      |  {"name":"s","type":"string"}
      |]}""".stripMargin

  private def writeSample(): Unit = {
    import spark.implicits._
    AvroSources.writeAvro(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s")
        .repartition(2), schemaJson, out)
  }

  test("written files are genuine avro containers (magic + decodable)") {
    writeSample()
    val files = java.nio.file.Files.list(java.nio.file.Paths.get(out))
      .iterator()
    var n = 0
    while (files.hasNext) {
      val f = files.next()
      val head = java.nio.file.Files.readAllBytes(f).take(4)
      // avro object container magic: 'O' 'b' 'j' 1
      assert(head.sameElements(Array[Byte]('O', 'b', 'j', 1)),
        s"$f does not start with the avro container magic")
      n += 1
    }
    assert(n >= 1)
    val back = AvroSources.readAvro(spark, out, StructType(Seq(
      StructField("k", LongType), StructField("s", StringType))))
    assert(back.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq === Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("declared-schema pruning reads a column subset") {
    writeSample()
    val ks = AvroSources.readAvro(spark, out,
      StructType(Seq(StructField("k", LongType))))
    assert(ks.columns.toSeq === Seq("k"))
    assert(ks.agg(sum("k")).head().getLong(0) === 6L)
  }

  test("nullable union schema roundtrips NULLs (the dirty-feed shape)") {
    import spark.implicits._
    // the q17l production schema maps nullable Spark fields to avro
    // `["null", T]` unions; with bare types the container writer
    // rejects the first NULL — pin the union write AND the read-side
    // null passthrough directly, not just via the degenerate sweep
    val unionJson =
      """{"type":"record","name":"r","fields":[
        |  {"name":"k","type":"long"},
        |  {"name":"s","type":["null","string"]},
        |  {"name":"v","type":["null","long"]}
        |]}""".stripMargin
    val dir = java.nio.file.Files.createTempDirectory("avro_nulls").toString
    AvroSources.writeAvro(
      Seq((1L, Some("a"), None: Option[Long]),
          (2L, None: Option[String], Some(7L)),
          (3L, None: Option[String], None: Option[Long]))
        .toDF("k", "s", "v"), unionJson, dir)
    val back = AvroSources.readAvro(spark, dir, StructType(Seq(
      StructField("k", LongType), StructField("s", StringType),
      StructField("v", LongType))))
      .orderBy("k").collect()
      .map(r => (r.getLong(0),
        Option(r.get(1)).map(_.toString), if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(back.toSeq === Seq(
      (1L, Some("a"), None), (2L, None, Some(7L)), (3L, None, None)))
  }

  test("overwrite sweeps stale subdirectories and temp files; no final-name collisions") {
    writeSample()
    // simulate an interrupted prior run: a nested _temporary dir and a
    // stranded attempt temp file inside the output dir — the recursive
    // overwrite sweep must clear both instead of wedging on
    // DirectoryNotEmptyException, and a re-read must see only the
    // committed (renamed) files
    val tmpDir = java.nio.file.Paths.get(out, "_temporary", "0")
    java.nio.file.Files.createDirectories(tmpDir)
    java.nio.file.Files.write(tmpDir.resolve("stray"), Array[Byte](1, 2))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(out, ".part-00099.avro.tmp-attempt-42"),
      Array[Byte](3))
    // also a NON-hidden junk name (old-style temp / foreign artifact):
    // the reader's pathGlobFilter must fence it even when the writer's
    // hidden-name discipline didn't apply
    java.nio.file.Files.write(
      java.nio.file.Paths.get(out, "part-00098.avro_tmp"), Array[Byte](4))
    // a read BETWEEN the crash and the next overwrite sweep (the ADVICE
    // window): truncated attempt bytes must never reach DataFileReader —
    // hidden names are skipped by the file index, non-.avro names by
    // pathGlobFilter
    assert(AvroSources.readAvro(spark, out, StructType(Seq(
      StructField("k", LongType), StructField("s", StringType))))
      .count() === 3L)
    writeSample() // must not throw
    val names = {
      val l = java.nio.file.Files.list(java.nio.file.Paths.get(out))
      try {
        val b = Seq.newBuilder[String]
        l.iterator().forEachRemaining(p => b += p.getFileName.toString)
        b.result()
      } finally l.close()
    }
    assert(names.forall(n => n.matches("part-\\d{5}\\.avro")),
      s"uncommitted artifacts survived the overwrite: $names")
    val back = AvroSources.readAvro(spark, out, StructType(Seq(
      StructField("k", LongType), StructField("s", StringType))))
    assert(back.count() === 3L)
  }

  test("exhausted reader iterator answers hasNext=false, not a closed-stream error") {
    writeSample()
    import org.apache.spark.sql.Row
    // drive the same iterator shape readAvro builds, through a consumer
    // that polls hasNext AGAIN after exhaustion (grouped/buffered
    // consumers do this) — the closed DataFileReader must not be touched
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("s", StringType)))
    val polled = AvroSources.readAvro(spark, out, schema)
      .mapPartitions { it =>
        var n = 0L
        while (it.hasNext) { it.next(); n += 1 }
        // the poll-after-exhaustion that used to hit a closed stream
        assert(!it.hasNext && !it.hasNext)
        Iterator(Row(n, "ok"))
      }(org.apache.spark.sql.Encoders.row(schema))
      .agg(sum("k")).head().getLong(0)
    assert(polled === 3L)
  }

  test("corrupt payloads, missing columns, and bad types fail loudly") {
    writeSample()
    // a declared column the files don't have
    val missing = intercept[Exception] {
      AvroSources.readAvro(spark, out, StructType(Seq(
        StructField("nope", LongType)))).count()
    }
    assert(missing.getMessage.contains("nope"))
    // a declared type the value can't take
    val badType = intercept[Exception] {
      AvroSources.readAvro(spark, out, StructType(Seq(
        StructField("s", LongType)))).count()
    }
    assert(badType.getMessage.contains("unsupported avro value"))
    // garbage bytes under the glob
    val dir = java.nio.file.Files.createTempDirectory("avro_corrupt")
    java.nio.file.Files.write(dir.resolve("junk.avro"),
      "this is not an avro container".getBytes)
    intercept[Exception] {
      AvroSources.readAvro(spark, dir.toString, StructType(Seq(
        StructField("k", LongType)))).count()
    }
  }
}
