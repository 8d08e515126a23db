package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.expressions.PngCodec
import graft.expressions.PngCodec.Raster

/** The pure-JVM PNG codec: encode/decode round trips through real zlib
  * compression for every scanline filter and channel count, rejection of
  * everything outside the supported subset, nearest-neighbor resampling,
  * and the pixel-real multimodal pipeline over it. */
class PngCodecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def gray(w: Int, h: Int, seed: Int): Raster =
    Raster(w, h, 1, Array.tabulate(w * h)(i => ((seed * 31 + i * 7) % 256).toByte))

  private def rgb(w: Int, h: Int, ch: Int, seed: Int): Raster =
    Raster(w, h, ch, Array.tabulate(w * h * ch)(i => ((seed * 17 + i * 3) % 256).toByte))

  test("encode -> decode round-trips bit-exactly for every filter type, " +
    "gray / RGB / RGBA") {
    for (ft <- 0 to 4; chans <- Seq(1, 3, 4)) {
      val r = rgb(9, 7, chans, ft + chans)
      val decoded = PngCodec.decode(PngCodec.encode(r, ft))
      assert(decoded.isDefined, s"filter $ft chans $chans failed to decode")
      val d = decoded.get
      assert((d.width, d.height, d.channels) == (9, 7, chans))
      assert(d.pixels.sameElements(r.pixels), s"filter $ft chans $chans pixel diff")
    }
  }

  test("1x1 and single-row/column images survive all filters") {
    for (ft <- 0 to 4) {
      assert(PngCodec.decode(PngCodec.encode(gray(1, 1, ft), ft)).get
        .pixels.sameElements(gray(1, 1, ft).pixels))
      assert(PngCodec.decode(PngCodec.encode(gray(6, 1, ft), ft)).get
        .pixels.sameElements(gray(6, 1, ft).pixels))
      assert(PngCodec.decode(PngCodec.encode(gray(1, 6, ft), ft)).get
        .pixels.sameElements(gray(1, 6, ft).pixels))
    }
  }

  test("decode rejects truncated, corrupt and unsupported payloads " +
    "with None, never garbage or a throw") {
    val good = PngCodec.encode(gray(8, 8, 1))
    assert(PngCodec.decode(good.take(30)).isEmpty) // cut mid-IDAT
    assert(PngCodec.decode("not a png".getBytes).isEmpty)
    assert(PngCodec.decode(Array.emptyByteArray).isEmpty)
    assert(PngCodec.decode(null).isEmpty)
    val bitDepth16 = good.clone(); bitDepth16(24) = 16 // IHDR bit-depth byte
    assert(PngCodec.decode(bitDepth16).isEmpty)
    val interlaced = good.clone(); interlaced(28) = 1 // IHDR interlace byte
    assert(PngCodec.decode(interlaced).isEmpty)
    val junkIdat = good.clone()
    junkIdat(45) = 0x55; junkIdat(46) = 0x55 // corrupt the zlib stream
    assert(PngCodec.decode(junkIdat).isEmpty)
    // FDICT zlib header (0x78BB: valid FCHECK, preset-dictionary bit
    // set): Inflater returns 0 with needsInput()==false forever — must
    // yield None, not a spin (the hostile-header contract)
    val idatTag = good.indexOfSlice("IDAT".getBytes)
    assert(idatTag > 0)
    val fdict = good.clone()
    fdict(idatTag + 4) = 0x78.toByte
    fdict(idatTag + 5) = 0xBB.toByte
    assert(PngCodec.decode(fdict).isEmpty)
  }

  test("nearest-neighbor resample: identity at same size, exact index " +
    "rule when downscaling") {
    val r = gray(8, 4, 3)
    assert(PngCodec.resampleNearest(r, 8, 4).pixels.sameElements(r.pixels))
    val half = PngCodec.resampleNearest(r, 4, 2)
    for (y <- 0 until 2; x <- 0 until 4)
      assert(half.pixels(y * 4 + x) == r.pixels((y * 4 / 2) * 8 + (x * 8 / 4)))
  }

  test("the pixel pipeline decodes what the fixture builder encoded — " +
    "dims AND resampled bytes match the formula") {
    val docs = graft.Tables(spark, TestSpark.sfDir, "documents").limit(50)
    val got = Multimodal.resamplePixels(
        Multimodal.syntheticPixelAssets(docs), 8, 6)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getString(5))).toMap
    assert(got.nonEmpty)
    for ((id, (w, h, ow, oh, hash)) <- got) {
      assert(w == (id % 13 + 4).toInt && h == (id % 11 + 4).toInt)
      val scale = math.min(1.0, math.min(8.0 / w, 6.0 / h))
      assert(ow == math.max(math.floor(w * scale).toInt, 1))
      assert(oh == math.max(math.floor(h * scale).toInt, 1))
      val px = Array.tabulate(ow * oh) { i =>
        val y = i / ow; val x = i % ow
        ((id * 31 + (y * h / oh) * w + (x * w / ow)) % 256).toByte
      }
      val hex = px.map(b => f"${b & 0xFF}%02x").mkString
      val expect = java.security.MessageDigest.getInstance("MD5")
        .digest(hex.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(hash == expect, s"pixel hash mismatch for asset $id")
    }
  }

  test("non-PNG payloads flow through the pixel path as nulls") {
    val docs = graft.Tables(spark, TestSpark.sfDir, "documents").limit(10)
    val jpegish = Multimodal.syntheticAssets(docs)
      .filter(col("modality") === "image/jpeg")
    val out = Multimodal.resamplePixels(jpegish, 8, 6)
    assert(out.filter(col("out_hash").isNotNull).isEmpty)
    assert(out.count() > 0)
  }
}
