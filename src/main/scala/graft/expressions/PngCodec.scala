package graft.expressions

import java.util.zip.{CRC32, Deflater, Inflater}

/** A REAL PNG pixel codec in pure JVM — no media libraries, only
  * `java.util.zip` (Inflater/Deflater/CRC32, part of every JRE) plus the
  * public PNG spec (W3C/RFC 2083): chunk framing, zlib-compressed IDAT,
  * and the five scanline filters (None/Sub/Up/Average/Paeth, spec §6).
  *
  * Scope: 8-bit-depth, non-interlaced images in color types 0
  * (grayscale, 1 channel), 2 (truecolor RGB, 3) and 6 (RGBA, 4) — the
  * overwhelming majority of real-world PNGs; anything else decodes to
  * None rather than garbage. The encoder emits color type 0 or 2 with a
  * caller-chosen per-row filter, which lets the decoder's five defilter
  * paths be round-trip-tested against the encoder instead of against
  * hand-built byte mazes.
  *
  * This closes the multimodal pixel seam for PNG: decode -> raster ->
  * nearest-neighbor resample -> re-encode all run on real bytes.
  * (JPEG entropy decode would need a DCT+Huffman implementation and
  * stays header-only — documented, not hidden.)
  */
object PngCodec {

  private val SIG = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)

  /** Decoded raster: `pixels` is row-major, `channels` interleaved
    * bytes per pixel (1 = gray, 3 = RGB, 4 = RGBA). */
  final case class Raster(width: Int, height: Int, channels: Int,
                          pixels: Array[Byte])

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) |
      ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)

  private def putBe32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 24) & 0xFF); out.write((v >>> 16) & 0xFF)
    out.write((v >>> 8) & 0xFF); out.write(v & 0xFF)
  }

  private def chunk(out: java.io.ByteArrayOutputStream, typ: String,
                    data: Array[Byte]): Unit = {
    putBe32(out, data.length)
    val t = typ.getBytes("US-ASCII")
    val crc = new CRC32()
    crc.update(t); crc.update(data)
    out.write(t, 0, 4)
    out.write(data, 0, data.length)
    putBe32(out, crc.getValue.toInt)
  }

  /** Encode a raster as a valid PNG (bit depth 8; color type 0 for 1
    * channel, 2 for 3, 6 for 4; non-interlaced). `filterType` (0-4) is
    * applied to every row — any value round-trips through [[decode]],
    * which is exactly how the defilter paths are tested. */
  def encode(r: Raster, filterType: Int = 0): Array[Byte] = {
    require(r.channels == 1 || r.channels == 3 || r.channels == 4,
      s"encoder supports 1/3/4 channels, got ${r.channels}")
    require(filterType >= 0 && filterType <= 4, s"filter $filterType")
    require(r.pixels.length == r.width * r.height * r.channels, "pixel buffer size")
    val bpp = r.channels
    val stride = r.width * bpp
    // filter each row per spec §6 (operating on the RAW bytes)
    val raw = new Array[Byte](r.height * (1 + stride))
    var y = 0
    while (y < r.height) {
      raw(y * (1 + stride)) = filterType.toByte
      var x = 0
      while (x < stride) {
        val cur = r.pixels(y * stride + x) & 0xFF
        val left = if (x >= bpp) r.pixels(y * stride + x - bpp) & 0xFF else 0
        val up = if (y > 0) r.pixels((y - 1) * stride + x) & 0xFF else 0
        val ul = if (x >= bpp && y > 0) r.pixels((y - 1) * stride + x - bpp) & 0xFF else 0
        val filtered = filterType match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, ul)
        }
        raw(y * (1 + stride) + 1 + x) = filtered.toByte
        x += 1
      }
      y += 1
    }
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION)
    deflater.setInput(raw); deflater.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) comp.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(SIG, 0, SIG.length)
    val ihdr = new java.io.ByteArrayOutputStream()
    putBe32(ihdr, r.width); putBe32(ihdr, r.height)
    ihdr.write(8) // bit depth
    ihdr.write(r.channels match { case 1 => 0; case 3 => 2; case 4 => 6 }) // color type
    ihdr.write(0); ihdr.write(0); ihdr.write(0) // compression/filter/interlace
    chunk(out, "IHDR", ihdr.toByteArray)
    chunk(out, "IDAT", comp.toByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Decode a PNG to its raster. None (never garbage, never a throw) for
    * anything outside the supported subset or structurally broken. */
  def decode(png: Array[Byte]): Option[Raster] = {
    try {
      if (png == null || png.length < 45) return None
      var i = 0
      while (i < 8) { if (png(i) != SIG(i)) return None; i += 1 }
      // walk chunks: IHDR first (spec), concatenate all IDAT data
      var pos = 8
      var width = 0; var height = 0; var colorType = -1
      val idat = new java.io.ByteArrayOutputStream()
      var seenIhdr = false
      while (pos + 8 <= png.length) {
        val len = be32(png, pos)
        if (len < 0 || pos + 12 + len > png.length) return None
        val typ = new String(png, pos + 4, 4, "US-ASCII")
        if (!seenIhdr) {
          if (typ != "IHDR" || len != 13) return None
          width = be32(png, pos + 8)
          height = be32(png, pos + 12)
          val bitDepth = png(pos + 16) & 0xFF
          colorType = png(pos + 17) & 0xFF
          val interlace = png(pos + 20) & 0xFF
          if (width <= 0 || height <= 0 || bitDepth != 8 || interlace != 0 ||
              !(colorType == 0 || colorType == 2 || colorType == 6)) return None
          seenIhdr = true
        } else if (typ == "IDAT") {
          idat.write(png, pos + 8, len)
        } else if (typ == "IEND") {
          pos = png.length // stop
        }
        pos += 12 + len
      }
      if (!seenIhdr) return None
      val channels = colorType match { case 0 => 1; case 2 => 3; case 6 => 4 }
      val stride = width * channels
      val rawLen = height * (1 + stride)
      // guard absurd allocations before inflating (a 100 TB corpus WILL
      // contain hostile headers): cap at 64 MP rasters
      if (width.toLong * height > (1L << 26)) return None
      val inflater = new Inflater()
      inflater.setInput(idat.toByteArray)
      val raw = new Array[Byte](rawLen)
      var off = 0
      while (off < rawLen && !inflater.finished()) {
        val n = inflater.inflate(raw, off, rawLen - off)
        // n == 0 with needsDictionary (FDICT zlib streams) would
        // otherwise spin forever: inflate keeps returning 0 while
        // needsInput stays false
        if (n == 0 && (inflater.needsInput() || inflater.needsDictionary())) {
          inflater.end(); return None
        }
        off += n
      }
      inflater.end()
      if (off != rawLen) return None
      // defilter per spec §6
      val px = new Array[Byte](height * stride)
      val bpp = channels
      var y = 0
      while (y < height) {
        val ft = raw(y * (1 + stride)) & 0xFF
        if (ft > 4) return None
        var x = 0
        while (x < stride) {
          val f = raw(y * (1 + stride) + 1 + x) & 0xFF
          val left = if (x >= bpp) px(y * stride + x - bpp) & 0xFF else 0
          val up = if (y > 0) px((y - 1) * stride + x) & 0xFF else 0
          val ul = if (x >= bpp && y > 0) px((y - 1) * stride + x - bpp) & 0xFF else 0
          val recon = ft match {
            case 0 => f
            case 1 => f + left
            case 2 => f + up
            case 3 => f + (left + up) / 2
            case 4 => f + paeth(left, up, ul)
          }
          px(y * stride + x) = recon.toByte
          x += 1
        }
        y += 1
      }
      Some(Raster(width, height, channels, px))
    } catch { case _: Exception => None }
  }

  /** Nearest-neighbor resample: out(x, y) = src(x*w/ow, y*h/oh) — exact
    * integer math, reproducible anywhere (including a SQL mirror). */
  def resampleNearest(r: Raster, ow: Int, oh: Int): Raster = {
    require(ow > 0 && oh > 0)
    val out = new Array[Byte](ow * oh * r.channels)
    var y = 0
    while (y < oh) {
      val sy = (y.toLong * r.height / oh).toInt
      var x = 0
      while (x < ow) {
        val sx = (x.toLong * r.width / ow).toInt
        var c = 0
        while (c < r.channels) {
          out((y * ow + x) * r.channels + c) =
            r.pixels((sy * r.width + sx) * r.channels + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    Raster(ow, oh, r.channels, out)
  }
}
