package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.etl.Scd

/** Streaming upsert into the warehouse — the lakehouse pattern that
  * connects the streaming and SCD families: each micro-batch is
  * applied to the dimension with the SAME set-based
  * [[Scd.scd1Upsert]] used in batch ETL, via foreachBatch. On plain
  * parquet the apply is read-merge-rewrite; on a transactional format
  * the identical logic becomes a MERGE.
  */
class StreamingUpsertSpec extends SparkTestBase {

  test("foreachBatch + scd1Upsert converges to latest-wins state") {
    import spark.implicits._

    val dimDir = Files.createTempDirectory("graft-dim").toString
    // seed dimension
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "bal")
      .withColumn("was_updated", lit(false))
      .write.mode(SaveMode.Overwrite).parquet(dimDir)

    // streamed updates: change k=2, insert k=9 (two files so the
    // AvailableNow run can split them into micro-batches)
    val updTop = Files.createTempDirectory("graft-upd")
    Seq((2L, 99.0), (9L, 1.0)).toDF("k", "bal")
      .repartition(2)
      .write.mode(SaveMode.Overwrite).parquet(updTop.toString)

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("bal",
        org.apache.spark.sql.types.DoubleType)))

    def applyBatch(batch: DataFrame, id: Long): Unit = {
      if (!batch.isEmpty) {
        val current = spark.read.parquet(dimDir)
          .select(col("k"), col("bal"))
        val incoming = batch.select(col("k"), col("bal"))
        val merged = Scd.scd1Upsert(current, incoming, Seq("k"))
        // plain-parquet apply: rewrite (a table format would MERGE);
        // materialize before overwriting the directory being read
        val rows = merged.collect()
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows.toSeq), merged.schema)
          .write.mode(SaveMode.Overwrite).parquet(dimDir)
      }
    }

    val q = spark.readStream.schema(schema).parquet(updTop.toString)
      .writeStream
      .foreachBatch(applyBatch _)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val finalState = spark.read.parquet(dimDir)
      .select(col("k"), col("bal")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(finalState == Map(1L -> 10.0, 2L -> 99.0, 3L -> 30.0, 9L -> 1.0),
      s"unexpected dimension state: $finalState")
  }

  test("foreachBatch + applyCdc streams MERGE semantics into the table") {
    import spark.implicits._

    val tblDir = Files.createTempDirectory("graft-cdc-tbl").toString
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "bal")
      .write.mode(SaveMode.Overwrite).parquet(tblDir)

    // op batches with DISJOINT keys so the result is independent of
    // micro-batch order: update k=2, delete k=3, insert k=9
    val opsTop = Files.createTempDirectory("graft-cdc-ops")
    Seq((2L, 21.0, "U", 1), (3L, 0.0, "D", 2), (9L, 1.0, "I", 3))
      .toDF("k", "bal", "op", "seq")
      .repartition(2)
      .write.mode(SaveMode.Overwrite).parquet(opsTop.toString)

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("bal",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("op",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("seq",
        org.apache.spark.sql.types.IntegerType)))

    def applyBatch(batch: DataFrame, id: Long): Unit = {
      if (!batch.isEmpty) {
        val current = spark.read.parquet(tblDir).select(col("k"), col("bal"))
        val merged = Scd.applyCdc(current, batch, Seq("k"), "op", "seq")
          .select(col("k"), col("bal"))
        val rows = merged.collect()
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows.toSeq), merged.schema)
          .write.mode(SaveMode.Overwrite).parquet(tblDir)
      }
    }

    val q = spark.readStream.schema(schema).parquet(opsTop.toString)
      .writeStream
      .foreachBatch(applyBatch _)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val finalState = spark.read.parquet(tblDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(finalState == Map(1L -> 10.0, 2L -> 21.0, 9L -> 1.0),
      s"unexpected CDC state: $finalState")
  }
}
