package graft.expressions

/** A REAL GIF (87a/89a) codec in pure JVM byte math — no media
  * libraries, only the public GIF specification (CompuServe 1989 /
  * W3C note): logical screen descriptor, global/local color tables,
  * graphic-control extensions, image descriptors, and the variable-width
  * LZW compression GIF defines (little-endian bit packing, CLEAR/EOI
  * codes, 12-bit dictionary cap).
  *
  * GIF is the multi-frame container that makes the VIDEO modality path
  * pixel-real: LZW is LOSSLESS, so decoded frame rasters are exactly
  * reproducible from a generating formula — the same oracle-mirroring
  * property [[PngCodec]] gives the image path. Frames are composited
  * onto the logical canvas honoring disposal methods 0/1 (leave),
  * 2 (restore background) and 3 (restore previous) and per-frame
  * transparency, so partial-frame animations decode to full canvases —
  * what a frame-sampling curation pass actually wants.
  *
  * Scope: non-interlaced frames (interlaced images decode to None
  * rather than garbage — they are rare in the animation corpus this
  * path targets and reordering rows is presentation, not information).
  * Output rasters are interleaved RGB (3 channels).
  */
object GifCodec {

  /** One composited frame: full-canvas interleaved RGB plus the
    * graphic-control delay (centiseconds; 0 when absent). */
  final case class Frame(delayCs: Int, pixels: Array[Byte])

  /** Decoded animation: logical canvas dims + composited frames. */
  final case class Gif(width: Int, height: Int, frames: Seq[Frame])

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)

  // ---------------------------------------------------------------- decode

  /** Decode a GIF to composited RGB frames. None (never garbage, never a
    * throw) for non-GIF bytes, interlaced frames, or structural damage. */
  def decode(gif: Array[Byte]): Option[Gif] = {
    try {
      if (gif == null || gif.length < 14) return None
      val hdr = new String(gif, 0, 6, "US-ASCII")
      if (hdr != "GIF87a" && hdr != "GIF89a") return None
      val width = le16(gif, 6)
      val height = le16(gif, 8)
      if (width <= 0 || height <= 0) return None
      // hostile-header guard, same rationale as PngCodec: cap the canvas
      if (width.toLong * height > (1L << 26)) return None
      val flags = gif(10) & 0xFF
      val bgIndex = gif(11) & 0xFF
      var pos = 13
      var globalPal: Array[Byte] = null
      if ((flags & 0x80) != 0) {
        val n = 2 << (flags & 7)
        if (pos + 3 * n > gif.length) return None
        globalPal = java.util.Arrays.copyOfRange(gif, pos, pos + 3 * n)
        pos += 3 * n
      }
      val canvas = new Array[Byte](width * height * 3)
      // initial canvas: background color if a global table defines it
      if (globalPal != null && 3 * bgIndex + 2 < globalPal.length) {
        var i = 0
        while (i < width * height) {
          canvas(3 * i) = globalPal(3 * bgIndex)
          canvas(3 * i + 1) = globalPal(3 * bgIndex + 1)
          canvas(3 * i + 2) = globalPal(3 * bgIndex + 2)
          i += 1
        }
      }
      val frames = Seq.newBuilder[Frame]
      var nFrames = 0
      var delayCs = 0
      var transparent = -1
      var disposal = 0
      while (pos < gif.length && (gif(pos) & 0xFF) != 0x3B) {
        (gif(pos) & 0xFF) match {
          case 0x21 => // extension
            if (pos + 2 > gif.length) return None
            val label = gif(pos + 1) & 0xFF
            pos += 2
            if (label == 0xF9) { // graphic control
              if (pos + 6 > gif.length) return None
              val len = gif(pos) & 0xFF
              if (len >= 4) {
                val gcFlags = gif(pos + 1) & 0xFF
                disposal = (gcFlags >> 2) & 7
                delayCs = le16(gif, pos + 2)
                transparent = if ((gcFlags & 1) != 0) gif(pos + 4) & 0xFF else -1
              }
            }
            // skip this extension's sub-blocks (incl. the GC block above)
            while (pos < gif.length && (gif(pos) & 0xFF) != 0) {
              pos += 1 + (gif(pos) & 0xFF)
              if (pos > gif.length) return None
            }
            pos += 1 // block terminator
          case 0x2C => // image descriptor
            if (pos + 10 > gif.length) return None
            val left = le16(gif, pos + 1)
            val top = le16(gif, pos + 3)
            val fw = le16(gif, pos + 5)
            val fh = le16(gif, pos + 7)
            val iflags = gif(pos + 9) & 0xFF
            pos += 10
            if ((iflags & 0x40) != 0) return None // interlaced: out of scope
            if (fw <= 0 || fh <= 0 || left + fw > width || top + fh > height)
              return None
            var pal = globalPal
            if ((iflags & 0x80) != 0) {
              val n = 2 << (iflags & 7)
              if (pos + 3 * n > gif.length) return None
              pal = java.util.Arrays.copyOfRange(gif, pos, pos + 3 * n)
              pos += 3 * n
            }
            if (pal == null) return None
            if (pos >= gif.length) return None
            val minCode = gif(pos) & 0xFF
            pos += 1
            // gather the LZW sub-block payload
            val data = new java.io.ByteArrayOutputStream()
            while (pos < gif.length && (gif(pos) & 0xFF) != 0) {
              val n = gif(pos) & 0xFF
              if (pos + 1 + n > gif.length) return None
              data.write(gif, pos + 1, n)
              pos += 1 + n
            }
            pos += 1 // terminator
            val indices = lzwDecode(data.toByteArray, minCode, fw * fh)
              .getOrElse(return None)
            // composite: disposal-aware snapshot BEFORE drawing (method 3
            // restores it after) / background fill AFTER (method 2)
            val before =
              if (disposal == 3) java.util.Arrays.copyOf(canvas, canvas.length)
              else null
            var y = 0
            while (y < fh) {
              var x = 0
              while (x < fw) {
                val idx = indices(y * fw + x) & 0xFF
                if (idx != transparent && 3 * idx + 2 < pal.length) {
                  val o = ((top + y) * width + (left + x)) * 3
                  canvas(o) = pal(3 * idx)
                  canvas(o + 1) = pal(3 * idx + 1)
                  canvas(o + 2) = pal(3 * idx + 2)
                }
                x += 1
              }
              y += 1
            }
            // total-output guard: the per-canvas cap above bounds ONE
            // frame, but a hostile file (huge canvas, thousands of 1x1
            // frames) could still force multi-GB allocation — and an
            // OutOfMemoryError is an Error the Exception catch below
            // cannot absorb. Bound the SUM of decoded frame bytes.
            if ((nFrames + 1).toLong * canvas.length > (1L << 28)) return None
            nFrames += 1
            frames += Frame(delayCs,
              java.util.Arrays.copyOf(canvas, canvas.length))
            disposal match {
              case 2 => // restore background over the frame rect
                val bg = if (globalPal != null && 3 * bgIndex + 2 < globalPal.length)
                  Array(globalPal(3 * bgIndex), globalPal(3 * bgIndex + 1),
                    globalPal(3 * bgIndex + 2))
                else Array[Byte](0, 0, 0)
                var yy = 0
                while (yy < fh) {
                  var xx = 0
                  while (xx < fw) {
                    val o = ((top + yy) * width + (left + xx)) * 3
                    canvas(o) = bg(0); canvas(o + 1) = bg(1); canvas(o + 2) = bg(2)
                    xx += 1
                  }
                  yy += 1
                }
              case 3 => System.arraycopy(before, 0, canvas, 0, canvas.length)
              case _ => ()
            }
            delayCs = 0; transparent = -1; disposal = 0
          case _ => return None
        }
      }
      val fs = frames.result()
      if (fs.isEmpty) None else Some(Gif(width, height, fs))
    } catch { case _: Exception => None }
  }

  /** GIF-flavor LZW decode: variable code width starting at
    * `minCode`+1, CLEAR = 2^min, EOI = CLEAR+1, dictionary capped at
    * 4096 entries, codes packed little-endian. Returns exactly
    * `expected` indices or None. */
  private[graft] def lzwDecode(data: Array[Byte], minCode: Int,
                                     expected: Int): Option[Array[Byte]] = {
    if (minCode < 2 || minCode > 8) return None
    val clear = 1 << minCode
    val eoi = clear + 1
    // dictionary as prefix-chain: suffix byte + prefix code per entry
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    val out = new Array[Byte](expected)
    var outPos = 0
    var dictSize = eoi + 1
    var codeWidth = minCode + 1
    var prev = -1
    var bitBuf = 0
    var bitCnt = 0
    var i = 0
    var c = 0
    while (c < clear) { prefix(c) = -1; suffix(c) = c.toByte; c += 1 }
    while (i < data.length || bitCnt >= codeWidth) {
      while (bitCnt < codeWidth && i < data.length) {
        bitBuf |= (data(i) & 0xFF) << bitCnt
        bitCnt += 8
        i += 1
      }
      if (bitCnt < codeWidth) return if (outPos == expected) Some(out) else None
      val code = bitBuf & ((1 << codeWidth) - 1)
      bitBuf >>>= codeWidth
      bitCnt -= codeWidth
      if (code == clear) {
        dictSize = eoi + 1; codeWidth = minCode + 1; prev = -1
      } else if (code == eoi) {
        return if (outPos == expected) Some(out) else None
      } else {
        if (code > dictSize || (code == dictSize && prev < 0)) return None
        // expand `code` (KwKwK case: code == dictSize uses prev + firstOf(prev))
        var sp = 0
        var cur = if (code == dictSize) prev else code
        if (code == dictSize) { stack(sp) = firstByte(prefix, suffix, prev); sp += 1 }
        while (cur >= 0) { stack(sp) = suffix(cur); sp += 1; cur = prefix(cur) }
        // stack holds the string reversed; emit
        while (sp > 0) {
          sp -= 1
          if (outPos >= expected) return None
          out(outPos) = stack(sp); outPos += 1
        }
        if (prev >= 0 && dictSize < 4096) {
          prefix(dictSize) = prev
          suffix(dictSize) = firstByte(prefix, suffix, code)
          dictSize += 1
          if (dictSize == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
        }
        prev = code
      }
    }
    if (outPos == expected) Some(out) else None
  }

  private def firstByte(prefix: Array[Int], suffix: Array[Byte], code: Int): Byte = {
    var c = code
    while (prefix(c) >= 0) c = prefix(c)
    suffix(c)
  }

  // ---------------------------------------------------------------- encode

  /** Encode full-canvas 8-bit-index frames as a GIF89a animation over one
    * global 256-entry palette (`palette` = 768 interleaved RGB bytes).
    * Every frame is a full-canvas image block (disposal 0, no
    * transparency, non-interlaced) — the shape the decoder's compositing
    * path reduces to identity on, which makes encoder→decoder round
    * trips byte-exact on pixels and lets the five LZW edge paths
    * (width growth, dictionary reset, KwKwK) be exercised against real
    * compressed bytes. */
  def encode(width: Int, height: Int, palette: Array[Byte],
             frames: Seq[(Int, Array[Byte])]): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xFFFF && height <= 0xFFFF)
    require(palette.length == 768, s"palette must be 256*3 bytes, got ${palette.length}")
    require(frames.nonEmpty, "at least one frame")
    frames.foreach { case (_, px) =>
      require(px.length == width * height, "frame must be full-canvas indices")
    }
    val out = new java.io.ByteArrayOutputStream()
    def le16w(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16w(width); le16w(height)
    out.write(0xF7) // global table, 256 entries, 8-bit color resolution
    out.write(0)    // background index
    out.write(0)    // aspect
    out.write(palette, 0, 768)
    for ((delayCs, px) <- frames) {
      out.write(0x21); out.write(0xF9); out.write(4) // graphic control
      out.write(0)    // disposal 0, no transparency
      le16w(delayCs)
      out.write(0)    // transparent index (unused)
      out.write(0)    // terminator
      out.write(0x2C) // image descriptor: full canvas
      le16w(0); le16w(0); le16w(width); le16w(height)
      out.write(0)    // no local table, not interlaced
      out.write(8)    // LZW min code size
      val lzw = lzwEncode(px, 8)
      var off = 0
      while (off < lzw.length) {
        val n = math.min(255, lzw.length - off)
        out.write(n)
        out.write(lzw, off, n)
        off += n
      }
      out.write(0) // data terminator
    }
    out.write(0x3B)
    out.toByteArray
  }

  /** GIF-flavor LZW encode (mirrors [[lzwDecode]]'s contract): emits
    * CLEAR first, resets the dictionary at 4096, EOI last. */
  private[graft] def lzwEncode(data: Array[Byte], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCnt = 0
    var codeWidth = minCode + 1
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += codeWidth
      while (bitCnt >= 8) {
        out.write((bitBuf & 0xFF).toInt)
        bitBuf >>>= 8
        bitCnt -= 8
      }
    }
    // dictionary: (prefixCode << 8 | byte) -> code
    var dict = new java.util.HashMap[Integer, Integer]()
    var dictSize = eoi + 1
    emit(clear)
    var prev = -1
    var i = 0
    while (i < data.length) {
      val b = data(i) & 0xFF
      if (prev < 0) prev = b
      else {
        val key = Integer.valueOf((prev << 8) | b)
        val hit = dict.get(key)
        if (hit != null) prev = hit.intValue()
        else {
          emit(prev)
          if (dictSize < 4096) {
            dict.put(key, Integer.valueOf(dictSize))
            dictSize += 1
            // width grows when the newly ASSIGNED code reaches 2^w — one
            // add LATER than the decoder's rule (grow after assigning
            // 2^w - 1), which is exactly right: the decoder lags the
            // encoder by one dictionary entry, so both sides cross their
            // thresholds between the same two emitted codes
            if (dictSize - 1 == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
          } else {
            emit(clear)
            dict = new java.util.HashMap[Integer, Integer]()
            dictSize = eoi + 1
            codeWidth = minCode + 1
          }
          prev = b
        }
      }
      i += 1
    }
    if (prev >= 0) emit(prev)
    emit(eoi)
    if (bitCnt > 0) out.write((bitBuf & 0xFF).toInt)
    out.toByteArray
  }
}
