package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** Real image-header parsing for the multimodal pipeline: width/height
  * straight from the payload bytes, no media libraries.
  *
  * Both formats are parsed from their PUBLIC container specs alone:
  *   - PNG (RFC 2083 / W3C): an 8-byte signature, then chunks; the spec
  *     requires IHDR first, whose first 8 data bytes are big-endian
  *     width, height.
  *   - JPEG (ITU-T T.81 / JFIF): an SOI marker, then a marker-segment
  *     walk (each segment = 0xFF, marker id, 2-byte big-endian length
  *     INCLUDING the length field) until a start-of-frame marker
  *     SOF0-SOF15 (0xC0-0xCF excluding DHT 0xC4, JPG 0xC8, DAC 0xCC —
  *     those reuse the 0xCn space but are not frames); the frame header
  *     carries [precision u8][height u16][width u16]. Fill bytes (0xFF
  *     padding before a marker) and standalone markers (TEM, RSTn) are
  *     skipped per spec. The walk is O(#segments), touches only segment
  *     headers, and never allocates.
  *
  * Anything else — truncated, not an image, or a dimensionless stream —
  * parses to "no dims" (SQL null), never garbage: a real corpus is full
  * of mislabeled and corrupt payloads and a scan-level parser must
  * degrade to null, not throw mid-job.
  */
object ImageHeaders {

  /** Width<<32 | height, or -1 when the payload has no parseable image
    * header. Static so whole-stage-codegen'd expressions call it
    * directly. */
  def packedDims(b: Array[Byte]): Long = {
    if (b == null || b.length < 4) return -1L
    // PNG: signature + IHDR-first rule
    if (b.length >= 24 &&
        (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        (b(4) & 0xFF) == 0x0D && (b(5) & 0xFF) == 0x0A &&
        (b(6) & 0xFF) == 0x1A && (b(7) & 0xFF) == 0x0A &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
      val w = be32(b, 16)
      val h = be32(b, 20)
      // PNG dims are u31 by spec (max 2^31 - 1); 0 is invalid
      if (w <= 0 || h <= 0) return -1L
      return (w.toLong << 32) | h.toLong
    }
    // JPEG: SOI then the marker walk
    if ((b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8) {
      var i = 2
      while (i + 1 < b.length) {
        // any number of 0xFF fill bytes precedes the marker id
        if ((b(i) & 0xFF) != 0xFF) return -1L
        var j = i
        while (j < b.length && (b(j) & 0xFF) == 0xFF) j += 1
        if (j >= b.length) return -1L
        val m = b(j) & 0xFF
        if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
          // SOFn: len(2) precision(1) height(2) width(2) ...
          if (j + 7 >= b.length) return -1L
          val h = be16(b, j + 4)
          val w = be16(b, j + 6)
          if (w <= 0 || h <= 0) return -1L
          return (w.toLong << 32) | h.toLong
        } else if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) {
          i = j + 1 // standalone marker (TEM / RSTn): no length field
        } else if (m == 0xD9 || m == 0xDA) {
          return -1L // EOI, or entropy-coded data began without a SOF
        } else {
          if (j + 2 >= b.length) return -1L
          val len = be16(b, j + 1)
          if (len < 2) return -1L
          i = j + 1 + len
        }
      }
      return -1L
    }
    -1L
  }

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) |
      ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
}

/** `graft_image_dims(payload) -> bigint`: [[ImageHeaders.packedDims]] as
  * a codegen'd scalar — width<<32|height, null when the payload is not a
  * parseable PNG/JPEG. One parse serves both dimensions
  * (`shiftright`/`bitwiseAND` unpack it); keeping the walk native keeps
  * the multimodal scan inside WholeStageCodegen. */
case class ImageDims(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_image_dims"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs BINARY, got ${child.dataType.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val p = ImageHeaders.packedDims(input.asInstanceOf[Array[Byte]])
    if (p < 0) null else p
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
        ${ev.value} = graft.expressions.ImageHeaders.packedDims($c);
        if (${ev.value} < 0) { ${ev.isNull} = true; }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
