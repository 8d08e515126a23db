package graft.expressions

import java.nio.charset.{CharacterCodingException, CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_nfc(text)` — Unicode NFC normalization (UAX #15, via the
  * platform `java.text.Normalizer`): decomposed sequences (`e` + U+0301)
  * compose to their canonical precomposed forms (`é`), the step every
  * text-dedup pipeline needs BEFORE hashing — the same visual text in
  * NFC and NFD hashes to different shingles otherwise. One pass, real
  * codegen (static call, stays inside whole-stage codegen); the fast
  * path skips allocation entirely when the text is already NFC (the
  * overwhelmingly common case for crawl text). Mirrorable: DuckDB ships
  * `nfc_normalize` with identical UAX #15 semantics. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs STRING text, got ${child.dataType.simpleString}")
  }

  override def nullSafeEval(text: Any): Any =
    TextRepair.nfc(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextRepair$$.MODULE$$.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_fix_mojibake(text)` — repair UTF-8 text that was mis-decoded
  * as Windows-1252/Latin-1 somewhere upstream ("cafÃ©" → "café"), the
  * single most common encoding defect in web-crawl corpora and the core
  * move of the public ftfy tool: invert the wrong decode (each char maps
  * back to the byte Windows-1252 would have produced — chars ≤ U+00FF
  * map identity, the 27 CP1252 graphics in U+0152–U+2122 map to
  * 0x80–0x9F), then STRICTLY re-decode the bytes as UTF-8. The repair
  * applies only when the whole string byte-maps AND the strict decode
  * succeeds AND some byte ≥ 0x80 participated (pure ASCII is returned
  * untouched, and a genuine "Ã" alone fails the strict decode and
  * passes through). Up to 3 passes unwind double/triple mojibake;
  * a string that legitimately spells a valid UTF-8 byte sequence in
  * cp1252 glyphs is indistinguishable from mojibake — the documented
  * (and, per ftfy, vanishingly rare) false-positive surface. */
case class FixMojibake(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_fix_mojibake"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs STRING text, got ${child.dataType.simpleString}")
  }

  override def nullSafeEval(text: Any): Any =
    TextRepair.fixMojibake(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextRepair$$.MODULE$$.fixMojibake($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextRepair {

  def nfc(text: UTF8String): UTF8String = {
    val s = text.toString
    // isNormalized is a cheap scan; crawl text is almost always NFC
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  /** Inverse of the Windows-1252 DECODE for the 0x80–0x9F graphics row
    * (indexed by byte - 0x80; 0 marks the five undefined holes, whose
    * decode produced the identity control char and therefore inverts via
    * the ≤ 0xFF identity path). */
  private val Cp1252Inverse: Map[Char, Int] = Map(
    '€' -> 0x80, '‚' -> 0x82, 'ƒ' -> 0x83, '„' -> 0x84,
    '…' -> 0x85, '†' -> 0x86, '‡' -> 0x87, 'ˆ' -> 0x88,
    '‰' -> 0x89, 'Š' -> 0x8A, '‹' -> 0x8B, 'Œ' -> 0x8C,
    'Ž' -> 0x8E, '‘' -> 0x91, '’' -> 0x92, '“' -> 0x93,
    '”' -> 0x94, '•' -> 0x95, '–' -> 0x96, '—' -> 0x97,
    '˜' -> 0x98, '™' -> 0x99, 'š' -> 0x9A, '›' -> 0x9B,
    'œ' -> 0x9C, 'ž' -> 0x9E, 'Ÿ' -> 0x9F)

  /** One inverse-decode + strict-re-decode pass; None = not repairable
    * (char outside the cp1252 image, pure ASCII, or invalid UTF-8). */
  private def repairOnce(s: String): Option[String] = {
    val bytes = new Array[Byte](s.length)
    var i = 0
    var hasHigh = false
    while (i < s.length) {
      val c = s.charAt(i)
      val b =
        if (c <= 0xFF) c.toInt
        else Cp1252Inverse.getOrElse(c, -1)
      if (b < 0) return None
      if (b >= 0x80) hasHigh = true
      bytes(i) = b.toByte
      i += 1
    }
    if (!hasHigh) return None
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try Some(dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString)
    catch { case _: CharacterCodingException => None }
  }

  def fixMojibake(text: UTF8String): UTF8String = {
    var s = text.toString
    var changed = false
    var pass = 0
    var continue = true
    while (continue && pass < 3) {
      repairOnce(s) match {
        case Some(r) if r != s => s = r; changed = true; pass += 1
        case _ => continue = false
      }
    }
    if (changed) UTF8String.fromString(s) else text
  }
}
