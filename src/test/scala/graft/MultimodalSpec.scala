package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkTestBase {

  test("real decode pipeline: typed batch shape, full coverage, determinism") {
    import spark.implicits._
    // the distributed decode contract on the REAL codec (the q16b
    // stub this test used to cover is retired — q16e's ImageIO path
    // supersedes it): Dataset[MediaRow] → mapPartitions(decodePng) →
    // Dataset[MediaFeatures], one decoded row per input row
    def pipeline = Tables(spark, sfDir).documents
      .select($"doc_id".as("media_id"),
        (lit(1) + pmod($"doc_id", lit(16))).cast("int").as("w"),
        (lit(1) + pmod($"doc_id", lit(13))).cast("int").as("h"))
      .as[(Long, Int, Int)]
      .mapPartitions(_.map { case (id, w, h) =>
        Multimodal.MediaRow(id, "image", Multimodal.pngBytes(w, h, seed = id))
      })
      .mapPartitions(Multimodal.decodePng _)
    val feats = pipeline.toDF().cache()
    try {
      val docs = Tables(spark, sfDir).documents.count()
      assert(feats.count() == docs, "one decoded row per media row")
      // decoded dims must equal the encoded dims — through real bytes
      assert(feats.filter($"width" =!= (pmod($"media_id", lit(16)) + 1) ||
        $"height" =!= (pmod($"media_id", lit(13)) + 1)).count() == 0)
      assert(feats.filter($"n_bytes" <= 8).count() == 0,
        "every payload must be a non-trivial PNG")
      // determinism: a second distributed run produces identical rows
      val again = pipeline.toDF()
      assert(feats.exceptAll(again).count() == 0 &&
        again.exceptAll(feats).count() == 0)
    } finally feats.unpersist()
  }

  test("media table keeps payload as binary with typed metadata") {
    val schema = Multimodal.mediaTable(spark, sfDir).schema
    assert(schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(schema("kind").dataType ==
      org.apache.spark.sql.types.StringType)
  }

  test("real PNG codec: encode/decode roundtrip and corrupt fail-fast") {
    // genuine ImageIO bytes, not the stub: dims survive the roundtrip
    val bytes = Multimodal.pngBytes(17, 9, seed = 42L)
    assert(bytes.length > 8 &&
      (bytes(1) & 0xff) == 'P' && (bytes(2) & 0xff) == 'N',
      "ImageIO must emit a real PNG signature")
    val feats = Multimodal.decodePng(Iterator(
      Multimodal.MediaRow(7L, "image", bytes))).toList
    assert(feats.map(f => (f.media_id, f.width, f.height)) ===
      List((7L, 17, 9)))
    // determinism: same (w, h, seed) → byte-identical payloads
    assert(java.util.Arrays.equals(bytes, Multimodal.pngBytes(17, 9, 42L)))
    // corrupt payloads must fail fast with the offending id, not skip
    val ex = intercept[IllegalArgumentException] {
      Multimodal.decodePng(Iterator(
        Multimodal.MediaRow(99L, "image", Array[Byte](1, 2, 3)))).toList
    }
    assert(ex.getMessage.contains("99"))
  }

  test("real WAV codec: container metadata roundtrip and corrupt fail-fast") {
    val bytes = Multimodal.wavBytes(nFrames = 250, seed = 5L)
    assert(new String(bytes, 0, 4, "US-ASCII") == "RIFF",
      "AudioSystem must emit a real RIFF/WAVE container")
    val feats = Multimodal.decodeWav(Iterator(
      Multimodal.MediaRow(3L, "audio", bytes))).toList
    assert(feats.map(f =>
      (f.media_id, f.n_frames, f.sample_rate, f.channels)) ===
      List((3L, 250L, 8000, 1)))
    assert(java.util.Arrays.equals(bytes, Multimodal.wavBytes(250, 5L)))
    val ex = intercept[IllegalArgumentException] {
      Multimodal.decodeWav(Iterator(
        Multimodal.MediaRow(42L, "audio", Array[Byte](9, 9, 9)))).toList
    }
    assert(ex.getMessage.contains("42"))
  }

  test("real multi-frame container: GIF frame count and sampling") {
    val bytes = Multimodal.gifBytes(w = 6, h = 4, nFrames = 5, seed = 3L)
    assert(new String(bytes, 0, 3, "US-ASCII") == "GIF",
      "writer must emit a real GIF container")
    val frames = Multimodal.sampleGifFrames(Iterator(
      Multimodal.MediaRow(8L, "video", bytes)), step = 2).toList
    assert(frames.map(f => (f.frame_idx, f.width, f.height)) ===
      List((0, 6, 4), (2, 6, 4), (4, 6, 4)))
    assert(frames.forall(_.n_frames == 5))
    assert(java.util.Arrays.equals(bytes, Multimodal.gifBytes(6, 4, 5, 3L)))
  }

  test("real resize: pinned interpolation gives deterministic bytes") {
    val src = Multimodal.pngBytes(48, 20, seed = 11L)
    val a = Multimodal.resizePng(src, 32, 13)
    val b = Multimodal.resizePng(src, 32, 13)
    assert(java.util.Arrays.equals(a, b),
      "nearest-neighbor resize must be byte-deterministic")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a))
    assert(img.getWidth == 32 && img.getHeight == 13)
  }

  test("aHash from real decoded pixels equals the closed-form recount") {
    // drive the REAL chain (encode → decode → hash) on one image and
    // rebuild the hash from the pixel closed form with no codec at all
    val seed = 123L
    val real = Multimodal.aHash64(Iterator(
      Multimodal.MediaRow(1L, "image", Multimodal.pngBytes(8, 8, seed))))
      .next().phash
    val g = (0 until 64).map { i =>
      val v = ((seed + i) * 2654435761L) & 0xffffff
      (v >> 16) + ((v >> 8) & 255) + (v & 255)
    }
    val tot = g.sum
    val want = g.map(gi => if (gi * 64 >= tot) '1' else '0').mkString
    assert(real == want, s"codec chain drifted: $real vs $want")
  }

  test("audio fingerprint from real decoded samples equals the closed form") {
    val seed = 77L
    val real = Multimodal.audioFingerprint64(Iterator(
      Multimodal.MediaRow(1L, "audio", Multimodal.wavBytes(256, seed))))
      .next().phash
    val e = new Array[Long](64)
    (0 until 256).foreach { i =>
      e(i / 4) += ((seed + i) * 2654435761L) & 0xff
    }
    val tot = e.sum
    val want = e.map(ei => if (ei * 64 >= tot) '1' else '0').mkString
    assert(real == want, s"audio codec chain drifted: $real vs $want")
  }

  test("q16k finds every planted audio clone pair at hamming 0") {
    import spark.implicits._
    val out = Multimodal.q16kAudioDedup.fn(spark, sfDir)
      .as[(Long, Long, Int)].collect()
    assert(out.nonEmpty)
    val pairs = out.map(p => (p._1, p._2)).toSet
    Tables(spark, sfDir).documents
      .filter($"doc_id" % 10 === 4 && $"doc_id" % 3 === 0)
      .select($"doc_id").as[Long].collect()
      .foreach { id =>
        assert(pairs.contains((id, id + 1000000L)),
          s"audio clone pair for media $id missing")
      }
    assert(out.filter(p => p._2 == p._1 + 1000000L).forall(_._3 == 0))
  }

  test("q16j finds every planted clone pair at hamming 0") {
    import spark.implicits._
    val out = Multimodal.q16jPhashDedup.fn(spark, sfDir)
      .as[(Long, Long, Int)].collect()
    assert(out.nonEmpty)
    out.foreach { case (a, b, h) =>
      assert(a < b && h >= 0 && h <= 4)
    }
    // every planted clone (seed re-inserted at +1e6) must surface as
    // a hamming-0 pair with its original
    val planted = Tables(spark, sfDir).documents
      .filter($"doc_id" % 10 === 3 && $"doc_id" % 3 === 0)
      .select($"doc_id").as[Long].collect()
    val pairs = out.map(p => (p._1, p._2)).toSet
    planted.foreach { id =>
      assert(pairs.contains((id, id + 1000000L)),
        s"clone pair for media $id missing")
    }
    val zero = out.filter(p => p._2 == p._1 + 1000000L)
    assert(zero.forall(_._3 == 0), "a clone pair scored hamming > 0")
  }
}
