package graft.expressions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact SentencePiece-convention BPE (the Llama-family tokenizer
  * shape), beside the GPT-2 encoder in [[BpeCodec]]. Both published
  * conventions share the greedy lowest-rank merge loop
  * ([[BpeCodec.mergeSyms]]) — what differs, per the public
  * SentencePiece / HF-tokenizers documentation, is everything around
  * it:
  *
  *   - pre-tokenization is METASPACE, not a regex class scan: one
  *     dummy-prefix space is prepended, every ' ' becomes ▁ (U+2581),
  *     and the string splits into pieces each STARTING with ▁ (other
  *     whitespace — tabs, newlines — stays inside its piece, exactly
  *     the Metaspace contract);
  *   - the merge alphabet is UNICODE CHARACTERS, not the GPT-2
  *     byte-level symbol remap;
  *   - out-of-vocabulary symbols BYTE-FALLBACK: each UTF-8 byte of the
  *     unmatched symbol becomes the `<0xNN>` token (uppercase hex, the
  *     convention Llama-family vocabs publish), so every input encodes
  *     — there is no unk on the id path.
  *
  * The canonical vocab induced by a merges table ([[canonicalSpVocab]])
  * is: ids 0..255 = `<0x00>`..`<0xFF>`, id 256+r = merge r's product.
  * Single characters are deliberately NOT in the canonical vocab — they
  * byte-fallback, which exercises the fallback path on real text the
  * way a pruned production vocab does. A published vocab can replace
  * the table wholesale (the ids expression takes it as a literal).
  *
  * Reference behavior per bearysta's scope: none — the reference has no
  * tokenizer; this extends the LLM-pipeline surface (q140 fertility,
  * q137 packing) beyond GPT-2 to the other dominant public convention.
  */
object SpCodec {

  /** U+2581 LOWER ONE EIGHTH BLOCK — SentencePiece's space marker. */
  val Meta = '▁'

  /** Metaspace pre-tokenization: `"▁" + text.replace(' ', '▁')`, split
    * so each piece begins with ▁. `"a  b"` → `["▁a", "▁", "▁b"]`;
    * empty text → `["▁"]`. Only ' ' is replaced — other whitespace
    * rides inside its piece (the documented Metaspace contract). */
  def preTokenize(text: String): ArrayBuffer[String] = {
    val s = new java.lang.StringBuilder(text.length + 1)
    s.append(Meta)
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      s.append(if (c == ' ') Meta else c)
      i += 1
    }
    val out = new ArrayBuffer[String]
    var start = 0
    i = 1
    while (i < s.length) {
      if (s.charAt(i) == Meta) { out += s.substring(start, i); start = i }
      i += 1
    }
    out += s.substring(start)
    out
  }

  /** Split a piece into its character symbols (full codepoints — a
    * surrogate pair is ONE symbol, matching SentencePiece's
    * unicode-character alphabet). */
  def splitChars(piece: String): ArrayBuffer[String] = {
    val out = new ArrayBuffer[String](piece.length)
    var i = 0
    while (i < piece.length) {
      val cp = piece.codePointAt(i)
      val n = Character.charCount(cp)
      out += piece.substring(i, i + n)
      i += n
    }
    out
  }

  /** Byte-fallback rendering of one symbol: its UTF-8 bytes as
    * `<0xNN>` tokens (uppercase hex, the published Llama convention). */
  def byteFallback(sym: String): Array[String] = {
    val bytes = sym.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[String](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = f"<0x${bytes(i) & 0xFF}%02X>"
      i += 1
    }
    out
  }

  /** The canonical vocab a merges table induces under this convention:
    * the 256 byte-fallback tokens get ids 0..255 (byte order), each
    * merge's product gets 256 + its rank. Single characters fall back
    * by construction. */
  def canonicalSpVocab(merges: Seq[(String, String)]): Seq[(String, Int)] =
    (0 until 256).map(b => f"<0x$b%02X>" -> b) ++
      merges.zipWithIndex.map { case ((a, b), r) => (a + b, 256 + r) }

  /** Encode one text to its final piece strings (pre-fallback): every
    * Metaspace pre-token char-split and greedy-merged. `cache` memoizes
    * per distinct pre-token, the [[BpeCodec.encodeTokens]] posture. */
  def encodePieces(text: String, ranks: java.util.HashMap[String, Integer],
                   cache: java.util.HashMap[String, Array[String]]): Array[String] = {
    val pieces = preTokenize(text)
    val out = new ArrayBuffer[String](pieces.length * 2)
    var i = 0
    while (i < pieces.length) {
      val p = pieces(i)
      var ts = cache.get(p)
      if (ts == null) {
        ts = BpeCodec.mergeSyms(splitChars(p), ranks).toArray
        if (cache.size >= (1 << 16)) cache.clear() // bound task memory
        cache.put(p, ts)
      }
      out ++= ts
      i += 1
    }
    out.toArray
  }

  /** Encode one text to integer ids through `vocab`, byte-falling-back
    * every symbol the vocab lacks. A fallback token itself missing from
    * the vocab maps to -1 (only possible with a non-canonical vocab —
    * loud and countable, the [[BpeTokenIds]] posture). */
  def encodeIds(text: String, ranks: java.util.HashMap[String, Integer],
                vocab: java.util.HashMap[String, Integer],
                cache: java.util.HashMap[String, Array[String]]): Array[Int] = {
    val toks = encodePieces(text, ranks, cache)
    val out = new ArrayBuffer[Int](toks.length)
    var i = 0
    while (i < toks.length) {
      val id = vocab.get(toks(i))
      if (id != null) out += id.intValue()
      else {
        val fb = byteFallback(toks(i))
        var j = 0
        while (j < fb.length) {
          val fid = vocab.get(fb(j))
          out += (if (fid == null) -1 else fid.intValue())
          j += 1
        }
      }
      i += 1
    }
    out.toArray
  }
}

/** `graft_sp_tokens(text, mergesTable)` — SentencePiece-convention
  * encode to the final PIECE strings (pre-fallback): Metaspace
  * pre-tokens, character alphabet, greedy lowest-rank merges. Same
  * merges file format as [[BpeTokens]] (one "left right" pair per
  * line). */
case class SpTokens(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_sp_tokens"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (left.dataType == StringType && right.dataType == StringType && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (STRING text, foldable STRING mergesTable), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  @transient private lazy val ranks =
    BpeCodec.ranksOf(BpeCodec.parseMerges(
      right.eval().asInstanceOf[UTF8String].toString))
  @transient private lazy val cache =
    new java.util.HashMap[String, Array[String]]()

  override def nullSafeEval(text: Any, merges: Any): Any = {
    val toks = SpCodec.encodePieces(
      text.asInstanceOf[UTF8String].toString, ranks, cache)
    val out = new Array[AnyRef](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_sp_ids(text, mergesTable, vocabJson)` — SentencePiece-
  * convention encode to INTEGER ids with byte fallback: [[SpTokens]]'s
  * pieces mapped through a vocab (the same flat-JSON format as
  * [[BpeTokenIds]]); any piece the vocab lacks expands to its UTF-8
  * bytes' `<0xNN>` tokens. With [[SpCodec.canonicalSpVocab]] every
  * text encodes with no -1s — the byte tokens close the alphabet. */
case class SpTokenIds(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_sp_ids"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (first.dataType == StringType && second.dataType == StringType &&
        second.foldable && third.dataType == StringType && third.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (STRING text, foldable STRING mergesTable, " +
        s"foldable STRING vocabJson)")
  }

  @transient private lazy val ranks =
    BpeCodec.ranksOf(BpeCodec.parseMerges(
      second.eval().asInstanceOf[UTF8String].toString))
  @transient private lazy val vocab =
    BpeCodec.parseVocabJson(third.eval().asInstanceOf[UTF8String].toString)
  @transient private lazy val cache =
    new java.util.HashMap[String, Array[String]]()

  override def nullSafeEval(text: Any, merges: Any, vj: Any): Any = {
    val ids = SpCodec.encodeIds(
      text.asInstanceOf[UTF8String].toString, ranks, vocab, cache)
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(ids)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}
