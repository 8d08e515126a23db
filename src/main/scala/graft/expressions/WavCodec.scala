package graft.expressions

/** A REAL WAV/PCM audio codec in pure JVM byte math — the RIFF container
  * (public Microsoft/IBM spec): "RIFF" size "WAVE", an "fmt " chunk
  * (PCM format tag 1, channel count, sample rate, block align, 16-bit
  * samples) and a "data" chunk of little-endian signed 16-bit PCM.
  * Unknown chunks (LIST/INFO/fact/cue) are skipped by their declared
  * size, as the spec requires of readers.
  *
  * Together with [[PngCodec]] this makes the image AND audio modality
  * paths pixel/sample-real: only video (JPEG entropy decode, codec-aware
  * keyframes) remains behind the documented byte-range seam. Anything
  * outside 16-bit PCM decodes to None — never garbage, never a throw:
  * scan-level robustness against the mislabeled payloads a real corpus
  * is full of.
  */
object WavCodec {

  /** Decoded clip: interleaved 16-bit samples (`samples.length` =
    * frames × channels). */
  final case class Clip(sampleRate: Int, channels: Int, samples: Array[Short])

  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) |
      ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)

  private def putLe32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
    out.write((v >>> 16) & 0xFF); out.write((v >>> 24) & 0xFF)
  }

  private def putLe16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
  }

  /** Encode interleaved 16-bit PCM as a canonical 44-byte-header WAV. */
  def encode(c: Clip): Array[Byte] = {
    require(c.sampleRate > 0 && c.channels > 0)
    require(c.samples.length % c.channels == 0, "partial frame")
    val dataLen = c.samples.length * 2
    val out = new java.io.ByteArrayOutputStream(44 + dataLen)
    out.write("RIFF".getBytes("US-ASCII"))
    putLe32(out, 36 + dataLen)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII"))
    putLe32(out, 16)
    putLe16(out, 1) // PCM
    putLe16(out, c.channels)
    putLe32(out, c.sampleRate)
    putLe32(out, c.sampleRate * c.channels * 2) // byte rate
    putLe16(out, c.channels * 2) // block align
    putLe16(out, 16) // bits per sample
    out.write("data".getBytes("US-ASCII"))
    putLe32(out, dataLen)
    var i = 0
    while (i < c.samples.length) { putLe16(out, c.samples(i) & 0xFFFF); i += 1 }
    out.toByteArray
  }

  /** Decode a 16-bit PCM WAV; None for anything else. Chunk walk per
    * spec: chunks are word-aligned (odd sizes padded), unknown chunk
    * types skipped. */
  def decode(wav: Array[Byte]): Option[Clip] = {
    try {
      if (wav == null || wav.length < 44) return None
      if (wav(0) != 'R' || wav(1) != 'I' || wav(2) != 'F' || wav(3) != 'F' ||
          wav(8) != 'W' || wav(9) != 'A' || wav(10) != 'V' || wav(11) != 'E')
        return None
      var pos = 12
      var sampleRate = 0; var channels = 0; var ok = false
      var samples: Array[Short] = null
      while (pos + 8 <= wav.length) {
        val typ = new String(wav, pos, 4, "US-ASCII")
        val len = le32(wav, pos + 4)
        if (len < 0 || pos + 8 + len > wav.length) return None
        if (typ == "fmt ") {
          if (len < 16) return None
          val fmt = le16(wav, pos + 8)
          channels = le16(wav, pos + 10)
          sampleRate = le32(wav, pos + 12)
          val bits = le16(wav, pos + 22)
          if (fmt != 1 || bits != 16 || channels <= 0 || sampleRate <= 0)
            return None
          ok = true
        } else if (typ == "data") {
          if (!ok) return None // fmt must precede data per spec
          val n = len / 2
          samples = new Array[Short](n)
          var i = 0
          while (i < n) { samples(i) = le16(wav, pos + 8 + 2 * i).toShort; i += 1 }
        }
        pos += 8 + len + (len & 1) // chunks are word-aligned
      }
      if (!ok || samples == null) None
      else Some(Clip(sampleRate, channels, samples))
    } catch { case _: Exception => None }
  }
}
