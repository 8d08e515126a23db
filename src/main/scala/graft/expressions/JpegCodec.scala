package graft.expressions

/** A REAL baseline JPEG codec in pure JVM byte math — no media
  * libraries, only the public ITU T.81 / JFIF specification: marker
  * segments, DQT/DHT table parsing, interleaved MCU entropy decoding
  * with canonical Huffman codes, dequantization, 8x8 IDCT, chroma
  * upsampling, YCbCr->RGB, byte stuffing, and DRI/RSTn restart
  * intervals.
  *
  * Decoder scope: baseline + extended-sequential DCT (SOF0/SOF1), 8-bit
  * precision, 1-component (grayscale) or 3-component (YCbCr) frames,
  * sampling factors 1-2 in each axis (4:4:4, 4:2:2, 4:4:0, 4:2:0),
  * arbitrary Huffman/quant tables as declared in the stream, restart
  * markers. Progressive (SOF2), arithmetic coding, 12-bit and CMYK
  * decode to None — never garbage, never a throw.
  *
  * Encoder scope: baseline, 4:4:4 or grayscale, flat-but-valid Huffman
  * tables (canonical codes, generated — not Annex K's; any decoder reads
  * them from the DHT segment), a parametric quant table where `q = 0`
  * means ALL ONES. All-ones quantization makes block-constant images
  * round-trip EXACTLY (a constant 8x8 block is a lone integer DC
  * coefficient; the float FDCT/IDCT error is orders below the final
  * rounding) — real Huffman entropy coding with an exactly mirrorable
  * result, the property the oracle-checked fixture query rides on.
  *
  * Together with [[PngCodec]] (lossless stills) and [[GifCodec]]
  * (lossless animation) this closes the image modality end to end: the
  * one remaining compressed-media family — lossy DCT stills — now
  * decodes for real too.
  */
object JpegCodec {
  import PngCodec.Raster

  /** Natural-order index for each zigzag position (T.81 figure 5). */
  private val ZIGZAG: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** cosT(u)(x) = C(u) * cos((2x+1) u pi / 16), C(0) = 1/sqrt(2):
    * the separable DCT-II basis; f = 0.25 * cosT^T F cosT. */
  private val COS: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    (if (u == 0) 1.0 / math.sqrt(2.0) else 1.0) *
      math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  // ---------------------------------------------------------------- decode

  /** Canonical Huffman table in the spec's DECODE form. */
  private final class Huff(bits: Array[Int], val vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1)
        k += bits(l - 1)
        maxCode(l) = if (bits(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
  }

  /** Entropy-coded-segment bit reader: FF00 stuffing, restart markers. */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var buf = 0
    private var cnt = 0
    def bit(): Int = {
      if (cnt == 0) {
        if (pos >= b.length) throw new IllegalStateException("eos")
        var byte0 = b(pos) & 0xFF
        pos += 1
        if (byte0 == 0xFF) {
          if (pos >= b.length) throw new IllegalStateException("eos")
          val next = b(pos) & 0xFF
          if (next == 0x00) pos += 1 // stuffing
          else throw new IllegalStateException("marker") // scan over-run
        }
        buf = byte0
        cnt = 8
      }
      cnt -= 1
      (buf >> cnt) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def decode(h: Huff): Int = {
      var code = bit()
      var l = 1
      while (code > h.maxCode(l)) {
        if (l >= 16) throw new IllegalStateException("bad huffman code")
        code = (code << 1) | bit()
        l += 1
      }
      h.vals(h.valPtr(l) + code - h.minCode(l)) & 0xFF
    }
    /** Byte-align and consume the expected RSTn marker. */
    def restart(n: Int): Unit = {
      cnt = 0
      if (pos + 2 > b.length || (b(pos) & 0xFF) != 0xFF ||
          (b(pos + 1) & 0xFF) != (0xD0 + n))
        throw new IllegalStateException("missing restart marker")
      pos += 2
    }
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private final case class Comp(id: Int, h: Int, v: Int, tq: Int)

  /** Decode a baseline JPEG to a gray (1-channel) or RGB (3-channel)
    * raster. None for anything outside the supported subset. */
  def decode(jpeg: Array[Byte]): Option[Raster] = {
    try {
      if (jpeg == null || jpeg.length < 4) return None
      if ((jpeg(0) & 0xFF) != 0xFF || (jpeg(1) & 0xFF) != 0xD8) return None
      var pos = 2
      val qt = Array.ofDim[Int](4, 64) // zigzag order, as transmitted
      val dcT = new Array[Huff](4)
      val acT = new Array[Huff](4)
      var width = 0; var height = 0
      var comps: Array[Comp] = null
      var dri = 0
      def u16(i: Int): Int = ((jpeg(i) & 0xFF) << 8) | (jpeg(i + 1) & 0xFF)
      while (pos + 4 <= jpeg.length) {
        if ((jpeg(pos) & 0xFF) != 0xFF) return None
        var marker = jpeg(pos + 1) & 0xFF
        pos += 2
        while (marker == 0xFF && pos < jpeg.length) { // fill bytes
          marker = jpeg(pos) & 0xFF; pos += 1
        }
        marker match {
          case 0xD8 => () // stray SOI
          case 0xD9 => return None // EOI before any scan completed
          case 0xC0 | 0xC1 => // baseline / extended sequential
            val len = u16(pos)
            if (pos + len > jpeg.length || len < 8) return None
            if ((jpeg(pos + 2) & 0xFF) != 8) return None // 12-bit: no
            height = u16(pos + 3)
            width = u16(pos + 5)
            val nf = jpeg(pos + 7) & 0xFF
            if (width <= 0 || height <= 0) return None
            if (width.toLong * height > (1L << 26)) return None // hostile dims
            if (nf != 1 && nf != 3) return None // CMYK etc.: no
            if (len != 8 + 3 * nf) return None
            comps = Array.tabulate(nf) { i =>
              val o = pos + 8 + 3 * i
              val hv = jpeg(o + 1) & 0xFF
              Comp(jpeg(o) & 0xFF, hv >> 4, hv & 15, jpeg(o + 2) & 0xFF)
            }
            if (comps.exists(c => c.h < 1 || c.h > 2 || c.v < 1 || c.v > 2 ||
                c.tq > 3)) return None
            pos += len
          case 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB |
               0xCD | 0xCE | 0xCF =>
            return None // progressive / lossless / arithmetic
          case 0xC4 => // DHT
            val len = u16(pos)
            if (pos + len > jpeg.length) return None
            var p = pos + 2
            while (p < pos + len) {
              val tcTh = jpeg(p) & 0xFF
              val tc = tcTh >> 4; val th = tcTh & 15
              if (tc > 1 || th > 3 || p + 17 > pos + len) return None
              val bits = Array.tabulate(16)(i => jpeg(p + 1 + i) & 0xFF)
              val n = bits.sum
              if (n > 256 || p + 17 + n > pos + len) return None
              val vals = java.util.Arrays.copyOfRange(jpeg, p + 17, p + 17 + n)
              if (tc == 0) dcT(th) = new Huff(bits, vals)
              else acT(th) = new Huff(bits, vals)
              p += 17 + n
            }
            pos += len
          case 0xDB => // DQT
            val len = u16(pos)
            if (pos + len > jpeg.length) return None
            var p = pos + 2
            while (p < pos + len) {
              val pqTq = jpeg(p) & 0xFF
              val pq = pqTq >> 4; val tq = pqTq & 15
              if (pq > 1 || tq > 3) return None
              if (p + 1 + 64 * (pq + 1) > pos + len) return None
              var i = 0
              while (i < 64) {
                qt(tq)(i) = if (pq == 0) jpeg(p + 1 + i) & 0xFF
                  else u16(p + 1 + 2 * i)
                i += 1
              }
              p += 1 + 64 * (pq + 1)
            }
            pos += len
          case 0xDD => // DRI
            if (u16(pos) != 4 || pos + 4 > jpeg.length) return None
            dri = u16(pos + 2)
            pos += 4
          case 0xDA => // SOS: decode the (single, interleaved) scan
            if (comps == null) return None
            val len = u16(pos)
            if (pos + len > jpeg.length) return None
            val ns = jpeg(pos + 2) & 0xFF
            if (ns != comps.length || len != 6 + 2 * ns) return None
            val useDc = new Array[Huff](ns)
            val useAc = new Array[Huff](ns)
            for (i <- 0 until ns) {
              val cs = jpeg(pos + 3 + 2 * i) & 0xFF
              if (comps(i).id != cs) return None // scan order must match frame
              val tdTa = jpeg(pos + 4 + 2 * i) & 0xFF
              useDc(i) = dcT(tdTa >> 4)
              useAc(i) = acT(tdTa & 15)
              if (useDc(i) == null || useAc(i) == null) return None
            }
            pos += len
            // T.81 §A.2: a single-component scan is NON-interleaved —
            // MCU = one 8x8 data unit regardless of the SOF sampling
            // factors (grayscale transcodes often keep a 0x22 luma
            // byte). Forcing 1x1 here makes the MCU grid ceil(w/8) x
            // ceil(h/8), which is exactly the non-interleaved layout;
            // output mapping is unaffected (one component = no
            // chroma upsampling).
            if (comps.length == 1) comps(0) = comps(0).copy(h = 1, v = 1)
            val hMax = comps.map(_.h).max
            val vMax = comps.map(_.v).max
            val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
            val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
            // per-component sample planes at their own resolution
            val planeW = comps.map(c => mcusX * c.h * 8)
            val planeH = comps.map(c => mcusY * c.v * 8)
            val planes = Array.tabulate(comps.length)(i =>
              new Array[Byte](planeW(i) * planeH(i)))
            val pred = new Array[Int](comps.length)
            val coef = new Array[Double](64)
            val tmp = new Array[Double](64)
            val rd = new BitReader(jpeg, pos)
            var mcu = 0
            var rstIdx = 0
            var my = 0
            while (my < mcusY) {
              var mx = 0
              while (mx < mcusX) {
                if (dri > 0 && mcu > 0 && mcu % dri == 0) {
                  rd.restart(rstIdx)
                  rstIdx = (rstIdx + 1) % 8
                  java.util.Arrays.fill(pred, 0)
                }
                var ci = 0
                while (ci < comps.length) {
                  val c = comps(ci)
                  val q = qt(c.tq)
                  var by = 0
                  while (by < c.v) {
                    var bx = 0
                    while (bx < c.h) {
                      // entropy-decode one 8x8 block
                      java.util.Arrays.fill(coef, 0.0)
                      val t = rd.decode(useDc(ci))
                      if (t > 15) throw new IllegalStateException("dc cat")
                      pred(ci) += extend(rd.bits(t), t)
                      coef(0) = pred(ci).toDouble * q(0)
                      var k = 1
                      var eob = false
                      while (k < 64 && !eob) {
                        val rs = rd.decode(useAc(ci))
                        val r = rs >> 4; val s = rs & 15
                        if (s == 0) {
                          if (r == 15) k += 16 else eob = true
                        } else {
                          k += r
                          if (k > 63) throw new IllegalStateException("ac run")
                          coef(ZIGZAG(k)) = extend(rd.bits(s), s).toDouble * q(k)
                          k += 1
                        }
                      }
                      // IDCT (separable): coef is natural-order
                      // (vertical-freq row, horizontal-freq column), so
                      // pass 1 contracts the VERTICAL frequency u against
                      // spatial y, pass 2 the horizontal v against x
                      var sy = 0
                      while (sy < 8) {
                        var v = 0
                        while (v < 8) {
                          var acc = 0.0
                          var u = 0
                          while (u < 8) { acc += COS(u)(sy) * coef(u * 8 + v); u += 1 }
                          tmp(sy * 8 + v) = acc
                          v += 1
                        }
                        sy += 1
                      }
                      val plane = planes(ci)
                      val px0 = (mx * c.h + bx) * 8
                      val py0 = (my * c.v + by) * 8
                      var yy = 0
                      while (yy < 8) {
                        var xx = 0
                        while (xx < 8) {
                          var acc = 0.0
                          var v = 0
                          while (v < 8) { acc += tmp(yy * 8 + v) * COS(v)(xx); v += 1 }
                          val s = math.rint(acc * 0.25 + 128.0).toInt
                          plane((py0 + yy) * planeW(ci) + px0 + xx) =
                            (if (s < 0) 0 else if (s > 255) 255 else s).toByte
                          xx += 1
                        }
                        yy += 1
                      }
                      bx += 1
                    }
                    by += 1
                  }
                  ci += 1
                }
                mcu += 1
                mx += 1
              }
              my += 1
            }
            // assemble: upsample by replication, color-convert
            if (comps.length == 1) {
              val out = new Array[Byte](width * height)
              var y = 0
              while (y < height) {
                System.arraycopy(planes(0), y * planeW(0), out, y * width, width)
                y += 1
              }
              return Some(Raster(width, height, 1, out))
            } else {
              val out = new Array[Byte](width * height * 3)
              var y = 0
              while (y < height) {
                var x = 0
                while (x < width) {
                  def samp(ci: Int): Int = {
                    val c = comps(ci)
                    val sx = x * c.h / hMax
                    val sy = y * c.v / vMax
                    planes(ci)(sy * planeW(ci) + sx) & 0xFF
                  }
                  val yv = samp(0).toDouble
                  val cb = samp(1) - 128.0
                  val cr = samp(2) - 128.0
                  def clamp(d: Double): Byte = {
                    val i = math.rint(d).toInt
                    (if (i < 0) 0 else if (i > 255) 255 else i).toByte
                  }
                  val o = (y * width + x) * 3
                  out(o) = clamp(yv + 1.402 * cr)
                  out(o + 1) = clamp(yv - 0.344136 * cb - 0.714136 * cr)
                  out(o + 2) = clamp(yv + 1.772 * cb)
                  x += 1
                }
                y += 1
              }
              return Some(Raster(width, height, 3, out))
            }
          case 0x01 => () // TEM, no payload
          case m if m >= 0xD0 && m <= 0xD7 => () // stray RST, no payload
          case _ => // APPn, COM, everything else: skip by declared length
            val len = u16(pos)
            if (len < 2 || pos + len > jpeg.length) return None
            pos += len
        }
      }
      None // ran off the end without a completed scan
    } catch { case _: Exception => None }
  }

  // ---------------------------------------------------------------- encode

  /** Flat-but-valid canonical Huffman spec: DC = the 12 category symbols
    * at 4 bits each (12 of 16 codes — never the all-ones prefix); AC =
    * all 256 RS symbols, 255 at 9 bits + one at 10 (Kraft sum < 1).
    * Deliberately NOT Annex K: these are generated, trivially correct,
    * and every decoder reads the actual tables from the DHT segment —
    * the file stays fully standard. */
  private val DC_BITS: Array[Int] = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val DC_VALS: Array[Byte] = Array.tabulate(12)(_.toByte)
  private val AC_BITS: Array[Int] = Array(0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0)
  private val AC_VALS: Array[Byte] = Array.tabulate(256)(_.toByte)

  /** (code, length) for each symbol of a canonical (BITS, VALS) table. */
  private def buildCodes(bits: Array[Int], vals: Array[Byte]): Array[Array[Int]] = {
    val codes = new Array[Array[Int]](256)
    var code = 0
    var k = 0
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l - 1)) {
        codes(vals(k) & 0xFF) = Array(code, l)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      l += 1
    }
    codes
  }
  private val DC_CODES = buildCodes(DC_BITS, DC_VALS)
  private val AC_CODES = buildCodes(AC_BITS, AC_VALS)

  /** Quant table (zigzag order) for quality knob `q`: entry k =
    * 1 + k*q/8, clamped to [1, 255]. `q = 0` -> ALL ONES (the exact
    * mode); larger q discards high frequencies progressively. */
  private[graft] def quantTable(q: Int): Array[Int] =
    Array.tabulate(64)(k => math.min(255, math.max(1, 1 + k * q / 8)))

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        buf = (buf << 1) | ((code >> i) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(buf & 0xFF)
          if ((buf & 0xFF) == 0xFF) out.write(0x00) // byte stuffing
          buf = 0; cnt = 0
        }
        i -= 1
      }
    }
    /** Pad with 1-bits to a byte boundary (spec's flush rule). */
    def flush(): Unit = if (cnt > 0) put((1 << (8 - cnt)) - 1, 8 - cnt)
  }

  private def category(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** Encode a 1-channel (grayscale) or 3-channel (RGB, written as YCbCr
    * 4:4:4) raster as a baseline JFIF JPEG. `q` picks [[quantTable]];
    * `restartInterval` > 0 emits DRI + RSTn every that many MCUs. */
  def encode(r: Raster, q: Int = 8, restartInterval: Int = 0): Array[Byte] = {
    require(r.channels == 1 || r.channels == 3,
      s"encoder supports gray or RGB, got ${r.channels} channels")
    require(r.width > 0 && r.height > 0 && r.width <= 0xFFFF && r.height <= 0xFFFF)
    require(restartInterval >= 0 && restartInterval <= 0xFFFF)
    val nc = r.channels
    val qtab = quantTable(q)
    // color-convert the whole image once (YCbCr planes at full res)
    val planes = Array.ofDim[Byte](nc, r.width * r.height)
    if (nc == 1) System.arraycopy(r.pixels, 0, planes(0), 0, r.pixels.length)
    else {
      var i = 0
      while (i < r.width * r.height) {
        val rr = r.pixels(3 * i) & 0xFF
        val gg = r.pixels(3 * i + 1) & 0xFF
        val bb = r.pixels(3 * i + 2) & 0xFF
        def cl(d: Double): Byte = {
          val v = math.rint(d).toInt
          (if (v < 0) 0 else if (v > 255) 255 else v).toByte
        }
        planes(0)(i) = cl(0.299 * rr + 0.587 * gg + 0.114 * bb)
        planes(1)(i) = cl(-0.168736 * rr - 0.331264 * gg + 0.5 * bb + 128.0)
        planes(2)(i) = cl(0.5 * rr - 0.418688 * gg - 0.081312 * bb + 128.0)
        i += 1
      }
    }
    val out = new java.io.ByteArrayOutputStream()
    def m(marker: Int): Unit = { out.write(0xFF); out.write(marker) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    m(0xD8) // SOI
    m(0xE0); u16(16) // APP0 JFIF
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1) // version
    out.write(0); u16(1); u16(1) // no density
    out.write(0); out.write(0) // no thumbnail
    m(0xDB); u16(2 + 65) // DQT, table 0, 8-bit (shared by all components)
    out.write(0x00)
    qtab.foreach(out.write)
    m(0xC0); u16(8 + 3 * nc) // SOF0
    out.write(8); u16(r.height); u16(r.width); out.write(nc)
    for (c <- 0 until nc) { out.write(c + 1); out.write(0x11); out.write(0) }
    m(0xC4) // DHT: DC table 0 + AC table 0 (all components use table 0)
    u16(2 + (1 + 16 + DC_VALS.length) + (1 + 16 + AC_VALS.length))
    out.write(0x00); DC_BITS.foreach(out.write); out.write(DC_VALS, 0, DC_VALS.length)
    out.write(0x10); AC_BITS.foreach(out.write); out.write(AC_VALS, 0, AC_VALS.length)
    if (restartInterval > 0) { m(0xDD); u16(4); u16(restartInterval) }
    m(0xDA); u16(6 + 2 * nc) // SOS
    out.write(nc)
    for (c <- 0 until nc) { out.write(c + 1); out.write(0x00) }
    out.write(0); out.write(63); out.write(0) // Ss, Se, AhAl
    val bw = new BitWriter(out)
    val pred = new Array[Int](nc)
    val block = new Array[Double](64)
    val tmp = new Array[Double](64)
    val zz = new Array[Int](64)
    val mcusX = (r.width + 7) / 8
    val mcusY = (r.height + 7) / 8
    var mcu = 0
    var rstIdx = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flush()
          m(0xD0 + rstIdx)
          rstIdx = (rstIdx + 1) % 8
          java.util.Arrays.fill(pred, 0)
        }
        var ci = 0
        while (ci < nc) {
          // gather the 8x8 block, replicating edge samples (keeps
          // block-constant fixtures constant => the exact-mode guarantee)
          var y = 0
          while (y < 8) {
            val sy = math.min(my * 8 + y, r.height - 1)
            var x = 0
            while (x < 8) {
              val sx = math.min(mx * 8 + x, r.width - 1)
              block(y * 8 + x) = (planes(ci)(sy * r.width + sx) & 0xFF) - 128.0
              x += 1
            }
            y += 1
          }
          // FDCT (separable): tmp = COS . block ; F = tmp . COS^T
          var u = 0
          while (u < 8) {
            var yy = 0
            while (yy < 8) {
              var acc = 0.0
              var x = 0
              while (x < 8) { acc += COS(u)(x) * block(yy * 8 + x); x += 1 }
              tmp(u * 8 + yy) = acc
              yy += 1
            }
            u += 1
          }
          var v = 0
          while (v < 8) {
            var uu = 0
            while (uu < 8) {
              var acc = 0.0
              var yy = 0
              while (yy < 8) { acc += tmp(uu * 8 + yy) * COS(v)(yy); yy += 1 }
              // F(v,u): quantize straight into zigzag order
              val f = acc * 0.25
              val k = invZigzag(v * 8 + uu)
              zz(k) = math.rint(f / qtab(k)).toInt
              uu += 1
            }
            v += 1
          }
          // clamp to baseline-representable categories (DC 11, AC 10)
          var k = 1
          while (k < 64) {
            if (zz(k) > 1023) zz(k) = 1023
            if (zz(k) < -1023) zz(k) = -1023
            k += 1
          }
          var diff = zz(0) - pred(ci)
          pred(ci) = zz(0)
          if (diff > 2047) diff = 2047
          if (diff < -2047) diff = -2047
          val t = category(diff)
          bw.put(DC_CODES(t)(0), DC_CODES(t)(1))
          if (t > 0)
            bw.put(if (diff >= 0) diff else diff + (1 << t) - 1, t)
          var run = 0
          k = 1
          var lastNz = 63
          while (lastNz > 0 && zz(lastNz) == 0) lastNz -= 1
          while (k <= lastNz) {
            if (zz(k) == 0) run += 1
            else {
              while (run > 15) {
                bw.put(AC_CODES(0xF0)(0), AC_CODES(0xF0)(1)) // ZRL
                run -= 16
              }
              val s = category(zz(k))
              val rs = (run << 4) | s
              bw.put(AC_CODES(rs)(0), AC_CODES(rs)(1))
              bw.put(if (zz(k) >= 0) zz(k) else zz(k) + (1 << s) - 1, s)
              run = 0
            }
            k += 1
          }
          if (lastNz < 63)
            bw.put(AC_CODES(0x00)(0), AC_CODES(0x00)(1)) // EOB
          ci += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    bw.flush()
    m(0xD9) // EOI
    out.toByteArray
  }

  /** zigzag position of each natural index (inverse of [[ZIGZAG]]). */
  private val invZigzag: Array[Int] = {
    val inv = new Array[Int](64)
    var k = 0
    while (k < 64) { inv(ZIGZAG(k)) = k; k += 1 }
    inv
  }
}
