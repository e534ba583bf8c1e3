package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.AviQueries
import graft.multimodal.Multimodal.MediaRow

/** Container/codec-level checks for the AVI pair (q16l/q16m) that the
  * DuckDB hash gate can't express: parser genuineness (walks real
  * chunk structure, skips foreign chunks, fails loudly on corrupt
  * bytes), the stride/bottom-up layout replayed against the raster
  * formula in plain Scala, and the lossy-codec fidelity bound for
  * MJPEG that has no closed form.
  */
class AviSpec extends AnyFunSuite {

  private val bytes = AviQueries.aviBytes(5, 3, 4, seed = 42L, handler = "DIB ")

  test("container is genuine RIFF/AVI and roundtrips structure") {
    assert(new String(bytes.slice(0, 4), "US-ASCII") === "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") === "AVI ")
    val p = AviQueries.parseAvi(bytes)
    assert(p.width === 5 && p.height === 3 && p.handler === "DIB " &&
      p.bitCount === 24 && p.frames.size === 4)
    // stride 5*3=15 -> padded to 16
    assert(p.frames.forall(_.length === 16 * 3))
  }

  test("parser is a real walker: skips an injected foreign chunk") {
    // splice a JUNK chunk between hdrl and movi — a real RIFF reader
    // must skip it by size, an offset-replay of the writer would break
    val p0 = AviQueries.parseAvi(bytes)
    val junk = "JUNK".getBytes("US-ASCII") ++
      Array[Byte](6, 0, 0, 0) ++ "abcdef".getBytes("US-ASCII")
    val hdrlEnd = {
      // locate the end of the hdrl LIST: 12-byte RIFF header, then
      // LIST <size> hdrl — size covers the 4-byte type + children
      val size = java.nio.ByteBuffer.wrap(bytes, 16, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
      12 + 8 + size
    }
    val spliced = bytes.slice(0, hdrlEnd) ++ junk ++
      bytes.slice(hdrlEnd, bytes.length)
    // fix the RIFF size field
    val riffSize = spliced.length - 8
    spliced(4) = (riffSize & 0xff).toByte
    spliced(5) = ((riffSize >> 8) & 0xff).toByte
    spliced(6) = ((riffSize >> 16) & 0xff).toByte
    spliced(7) = ((riffSize >> 24) & 0xff).toByte
    val p = AviQueries.parseAvi(spliced)
    assert((p.width, p.height, p.handler, p.bitCount) ===
      ((p0.width, p0.height, p0.handler, p0.bitCount)))
    assert(p.frames.size === p0.frames.size &&
      p.frames.zip(p0.frames).forall { case (a, b) =>
        java.util.Arrays.equals(a, b)
      })
  }

  test("parser handles the standard 'rec ' interleaved frame grouping") {
    val flat = AviQueries.parseAvi(bytes)
    val rec = AviQueries.parseAvi(
      AviQueries.aviBytes(5, 3, 4, seed = 42L, handler = "DIB ",
        recGrouped = true))
    assert((rec.width, rec.height, rec.handler, rec.frames.size) ===
      ((flat.width, flat.height, flat.handler, flat.frames.size)))
    assert(rec.frames.zip(flat.frames).forall { case (a, b) =>
      java.util.Arrays.equals(a, b)
    })
  }

  test("corrupt payloads fail loudly, not silently") {
    intercept[IllegalArgumentException] {
      AviQueries.parseAvi("not a riff file at all".getBytes)
    }
    // right magic, truncated body: a frame chunk overruns its parent
    intercept[IllegalArgumentException] {
      AviQueries.parseAvi(bytes.slice(0, bytes.length - 10))
    }
  }

  test("DIB stride/bottom-up decode replays the raster formula exactly") {
    // w=5 -> 15-byte rows padded to 16: the alignment path is live
    val stats = AviQueries.sampleDibFrames(
      Iterator(MediaRow(7L, "video", bytes)), step = 1).toVector
    assert(stats.map(_.frame_idx) === Vector(0, 1, 2, 3))
    stats.foreach { s =>
      var (er, eg, eb) = (0L, 0L, 0L)
      for (i <- 0L until 15L) {
        val v = (((42L + s.frame_idx * 7919L + i) * 2654435761L) & 0xffffff).toInt
        er += (v >> 16) & 0xff; eg += (v >> 8) & 0xff; eb += v & 0xff
      }
      assert((s.sum_r, s.sum_g, s.sum_b) === ((er, eg, eb)),
        s"frame ${s.frame_idx} channel sums diverge from the closed form")
    }
  }

  test("MJPEG frames decode via the real JDK codec within a lossy bound") {
    val mj = AviQueries.aviBytes(16, 12, 3, seed = 9L, handler = "MJPG")
    val p = AviQueries.parseAvi(mj)
    assert(p.handler === "MJPG" && p.frames.size === 3)
    (0 until 3).foreach { f =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(p.frames(f)))
      assert(img.getWidth === 16 && img.getHeight === 12)
      // decoded channel means vs the pre-encode gradient raster: JPEG
      // on smooth content keeps means close; ±16 absorbs quantization
      // + chroma subsampling across JDK encoder versions
      var (dr, dg, db) = (0L, 0L, 0L)
      var (er, eg, eb) = (0L, 0L, 0L)
      for (y <- 0 until 12; x <- 0 until 16) {
        val v = img.getRGB(x, y)
        dr += (v >> 16) & 0xff; dg += (v >> 8) & 0xff; db += v & 0xff
        er += (4 * x + 2 * f) % 256; eg += (4 * y + 3 * f) % 256
        eb += (x + y + f) % 256
      }
      val n = 16 * 12
      assert(math.abs(dr - er) <= 16L * n, s"frame $f red mean drifts")
      assert(math.abs(dg - eg) <= 16L * n, s"frame $f green mean drifts")
      assert(math.abs(db - eb) <= 16L * n, s"frame $f blue mean drifts")
    }
  }

  test("writer is deterministic byte-for-byte") {
    assert(java.util.Arrays.equals(bytes,
      AviQueries.aviBytes(5, 3, 4, seed = 42L, handler = "DIB ")))
    assert(java.util.Arrays.equals(
      AviQueries.aviBytes(9, 8, 2, seed = 3L, handler = "MJPG"),
      AviQueries.aviBytes(9, 8, 2, seed = 3L, handler = "MJPG")))
  }
}
