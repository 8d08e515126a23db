package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.expressions.{JpegCodec, PngCodec}
import PngCodec.Raster

/** The pure-JVM baseline JPEG codec: the exact mode (all-ones quant over
  * 8x8 block-constant mosaics) round-trips bit-exactly through REAL
  * Huffman entropy coding; an independent-decoder cross-check against
  * the JDK's ImageIO JPEG reader covers our encoder, and an
  * independent-ENCODER cross-check (ImageIO-written lossy streams,
  * including 4:2:0 chroma subsampling) covers our decoder; progressive
  * and structural damage are rejected with None; and the pixel-real
  * multimodal pipeline over the fixture corpus matches the formula. */
class JpegCodecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Block-constant mosaic: block (bx, by) holds (seed + by*bw + bx) % 256. */
  private def mosaic(w: Int, h: Int, nc: Int, seed: Int): Raster = {
    val bw = (w + 7) / 8
    val px = new Array[Byte](w * h * nc)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until nc)
      px((y * w + x) * nc + c) = ((seed + (y / 8) * bw + (x / 8)) % 256).toByte
    Raster(w, h, nc, px)
  }

  /** Genuinely smooth gradient — NO mod-256 wrap, so the only encoder
    * error is quantization, not ringing at artificial step edges. */
  private def gradient(w: Int, h: Int, nc: Int): Raster = {
    val px = new Array[Byte](w * h * nc)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until nc)
      px((y * w + x) * nc + c) =
        math.min(x * 160 / math.max(w - 1, 1) + y * 3 + c * 5, 255).toByte
    Raster(w, h, nc, px)
  }

  test("exact mode round-trips bit-exactly: gray + RGB, ragged dims, restarts") {
    for ((w, h, nc, ri) <- Seq((24, 16, 1, 0), (21, 13, 1, 2), (8, 8, 3, 0),
                               (19, 10, 3, 3), (4, 4, 3, 1), (33, 7, 1, 4))) {
      val r = mosaic(w, h, nc, w * 7 + h * 3 + nc)
      val jpeg = JpegCodec.encode(r, q = 0, restartInterval = ri)
      val dec = JpegCodec.decode(jpeg)
      assert(dec.isDefined, s"decode failed for ${(w, h, nc, ri)}")
      val g = dec.get
      assert((g.width, g.height, g.channels) == (w, h, nc))
      assert(g.pixels.sameElements(r.pixels), s"pixel diff for ${(w, h, nc, ri)}")
    }
  }

  test("single-component scans are non-interleaved (T.81 A.2): a gray " +
    "JPEG whose SOF declares 2x2 sampling decodes identically to 1x1") {
    // grayscale transcodes often keep the 0x22 luma sampling byte from
    // a 4:2:0 source; the scan layout is the same either way (MCU = one
    // data unit for Ns = 1), so the declared factors must be ignored
    val r = mosaic(24, 16, 1, 5)
    val jpeg = JpegCodec.encode(r, q = 0)
    val sof = jpeg.indexOfSlice(Array(0xFF.toByte, 0xC0.toByte))
    assert(sof > 0)
    assert(jpeg(sof + 11) == 0x11.toByte) // encoder writes 1x1
    val patched = jpeg.clone()
    patched(sof + 11) = 0x22.toByte
    val dec = JpegCodec.decode(patched)
    assert(dec.isDefined, "2x2-sampled single-component scan must decode")
    assert(dec.get.pixels.sameElements(r.pixels))
  }

  test("ImageIO (independent JDK decoder) reads the exact-mode output " +
    "pixel-identically — a DC-only block is exact in any conformant IDCT") {
    val r = mosaic(21, 13, 1, 9)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(JpegCodec.encode(r, q = 0)))
    assert(img != null && img.getWidth == 21 && img.getHeight == 13)
    // read RAW samples: getRGB on a gray image applies the linear-gray ->
    // sRGB colorspace transform and would corrupt the comparison
    for (y <- 0 until 13; x <- 0 until 21) {
      val v = r.pixels(y * 21 + x) & 0xFF
      assert(img.getRaster.getSample(x, y, 0) == v, s"pixel ($x,$y)")
    }
  }

  test("lossy mode is a REAL encoder: ImageIO decodes a q=8 gradient " +
    "close to the source (not exact, not garbage)") {
    val r = gradient(32, 24, 1)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(JpegCodec.encode(r, q = 8)))
    assert(img != null)
    var sumAbs = 0L
    for (y <- 0 until 24; x <- 0 until 32) {
      val d = math.abs(img.getRaster.getSample(x, y, 0) - (r.pixels(y * 32 + x) & 0xFF))
      assert(d <= 32, s"pixel ($x,$y) off by $d") // ringing at the wrap edges
      sumAbs += d
    }
    assert(sumAbs.toDouble / (32 * 24) <= 6.0, s"mean err ${sumAbs / 768.0}")
  }

  test("our decoder reads ImageIO-written lossy JPEGs (gray 4:4:4 and " +
    "RGB 4:2:0) within tolerance of ImageIO's own decode of the same bytes") {
    for (nc <- Seq(1, 3)) {
      val r = gradient(40, 26, nc)
      val imgType = if (nc == 1) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
                    else java.awt.image.BufferedImage.TYPE_3BYTE_BGR
      val bi = new java.awt.image.BufferedImage(40, 26, imgType)
      // write RAW samples: setRGB on a gray image would apply the
      // sRGB -> linear-gray colorspace transform and skew the source
      for (y <- 0 until 26; x <- 0 until 40; c <- 0 until nc)
        bi.getRaster.setSample(x, y, c, r.pixels((y * 40 + x) * nc + c) & 0xFF)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(bi, "jpg", bos))
      val bytes = bos.toByteArray
      val ours = JpegCodec.decode(bytes)
      assert(ours.isDefined, s"decode failed, nc=$nc")
      val g = ours.get
      assert((g.width, g.height) == (40, 26))
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      var sumAbs = 0L; var n = 0
      for (y <- 0 until 26; x <- 0 until 40) {
        val rgb = ref.getRGB(x, y)
        for (c <- 0 until g.channels) {
          // gray ref must be read as a RAW sample (getRGB gamma-converts
          // gray); RGB ref decodes straight to sRGB, getRGB is faithful
          val rv = if (nc == 1) ref.getRaster.getSample(x, y, 0)
                   else (rgb >> (16 - 8 * c)) & 0xFF
          val d = math.abs((g.pixels((y * 40 + x) * g.channels + c) & 0xFF) - rv)
          assert(d <= 12, s"nc=$nc pixel ($x,$y) ch $c off by $d")
          sumAbs += d; n += 1
        }
      }
      assert(sumAbs.toDouble / n <= 2.5, s"nc=$nc mean err ${sumAbs.toDouble / n}")
    }
  }

  test("progressive, truncated, and garbage streams decode to None, never a throw") {
    // ImageIO writes a REAL progressive (SOF2) stream when asked
    val bi = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val par = wr.getDefaultWriteParam
    par.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    wr.setOutput(javax.imageio.ImageIO.createImageOutputStream(bos))
    wr.write(null, new javax.imageio.IIOImage(bi, null, null), par)
    wr.dispose()
    val prog = bos.toByteArray
    assert(prog.sliding(2).exists(p => (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xC2),
      "fixture is not progressive")
    assert(JpegCodec.decode(prog).isEmpty)
    val good = JpegCodec.encode(mosaic(16, 8, 1, 3), q = 0)
    assert(JpegCodec.decode(java.util.Arrays.copyOf(good, good.length - 4)).isEmpty)
    assert(JpegCodec.decode(good.take(30)).isEmpty)
    assert(JpegCodec.decode("not a jpeg at all, sorry".getBytes).isEmpty)
    assert(JpegCodec.decode(Array.emptyByteArray).isEmpty)
    assert(JpegCodec.decode(null).isEmpty)
  }

  test("the pixel pipeline decodes what the fixture builder encoded — " +
    "dims, channels AND raster bytes match the mosaic formula") {
    val docs = graft.Tables(spark, TestSpark.sfDir, "documents").limit(40)
    val rows = Multimodal.decodePixels(
      Multimodal.syntheticJpegAssets(docs)).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val id = r.getLong(0)
      val w = (id % 21 + 4).toInt; val h = (id % 17 + 4).toInt
      val nc = if (id % 2 == 1) 3 else 1
      assert((r.getInt(1), r.getInt(2), r.getInt(3)) == (w, h, nc), s"asset $id")
      val bw = (w + 7) / 8
      val hex = Array.tabulate(w * h) { i =>
        val v = ((id * 29 + (i / w / 8) * bw + (i % w / 8)) % 256).toInt
        f"$v%02x" * nc
      }.mkString
      val expect = java.security.MessageDigest.getInstance("MD5")
        .digest(hex.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(r.getString(4) == expect, s"pixel hash mismatch asset $id")
    }
  }

  test("non-JPEG payloads flow through the pixel path as null-feature rows") {
    val docs = graft.Tables(spark, TestSpark.sfDir, "documents").limit(10)
    val out = Multimodal.decodePixels(Multimodal.syntheticAudioAssets(docs))
    assert(out.filter(col("pix_hash").isNotNull).isEmpty)
    assert(out.count() == 10)
  }
}
