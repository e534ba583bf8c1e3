package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkTestBase {

  test("decode stub: deterministic, bounded dims, full coverage") {
    import spark.implicits._
    val feats = Multimodal.decodeAll(spark, sfDir).toDF().cache()
    val docs = Tables(spark, sfDir).documents.count()
    assert(feats.count() == docs)
    assert(feats.filter($"width" < 1 || $"width" > 64 ||
      $"height" < 1 || $"height" > 64).count() == 0)
    // payload length must equal the source text byte length
    val joined = feats.join(Tables(spark, sfDir).documents,
      $"media_id" === $"doc_id")
    assert(joined.filter($"n_bytes" =!= octet_length($"text")).count() == 0)
    // determinism: a second run produces identical rows
    val again = Multimodal.decodeAll(spark, sfDir).toDF()
    assert(feats.exceptAll(again).count() == 0 &&
      again.exceptAll(feats).count() == 0)
    feats.unpersist()
  }

  test("media table keeps payload as binary with typed metadata") {
    val schema = Multimodal.mediaTable(spark, sfDir).schema
    assert(schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(schema("kind").dataType ==
      org.apache.spark.sql.types.StringType)
  }
}
