package graft.expressions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact WordPiece (the BERT-family tokenizer shape), beside the GPT-2
  * encoder in [[BpeCodec]] and the SentencePiece convention in
  * [[SpCodec]] — the third dominant published tokenizer family, from
  * the published algorithm (Schuster & Nakajima 2012; the BERT paper's
  * `tokenization.py`; the HF-tokenizers WordPiece docs):
  *
  *   - encoding is GREEDY LONGEST-MATCH-FIRST over a VOCABULARY (not a
  *     merge-rank loop — the defining contrast with BPE): per word, at
  *     each position the longest vocab piece matching the remaining
  *     prefix is taken, continuation pieces carry the `##` marker, and
  *     ANY dead end (no piece matches) maps the WHOLE word to `[UNK]`
  *     — no backtracking, per the published algorithm;
  *   - words longer than [[WpCodec.MaxWordChars]] codepoints are
  *     `[UNK]` outright (BERT's `max_input_chars_per_word = 100`);
  *   - pre-tokenization here is whitespace (`\s+`, empties dropped) —
  *     BERT's punctuation splitting / lowercasing is the CALLER's
  *     normalizer, declared rather than hidden;
  *   - the vocab format is the published one-piece-per-line
  *     `vocab.txt`, id = line number — published BERT vocab files drop
  *     in unchanged;
  *   - all position arithmetic is in Unicode CODEPOINTS (a surrogate
  *     pair is one character), matching both SentencePiece's alphabet
  *     convention and the SQL mirror's `substr`/`length` semantics.
  *
  * Reference behavior per bearysta's scope: none — the reference has no
  * tokenizer; this completes the LLM-pipeline tokenizer surface (GPT-2
  * byte-level BPE, SentencePiece BPE with byte fallback, WordPiece).
  */
object WpCodec {

  val Unk = "[UNK]"

  /** BERT's `max_input_chars_per_word`: longer words are [UNK]. */
  val MaxWordChars = 100

  /** Whitespace pre-tokenization: `\s+` split, empty tokens dropped. */
  def preTokenize(text: String): ArrayBuffer[String] = {
    val out = new ArrayBuffer[String]
    var start = -1
    var i = 0
    while (i < text.length) {
      if (Character.isWhitespace(text.charAt(i))) {
        if (start >= 0) { out += text.substring(start, i); start = -1 }
      } else if (start < 0) start = i
      i += 1
    }
    if (start >= 0) out += text.substring(start)
    out
  }

  /** Parsed vocab: piece -> line id (first line wins on duplicates)
    * plus the longest piece length in CODEPOINTS (the greedy scan's
    * upper bound; `##` marker excluded for continuation pieces). */
  final class Vocab(val ids: java.util.HashMap[String, Integer],
                    val maxPieceChars: Int, val unkId: Int)

  def parseVocab(txt: String): Vocab = {
    val ids = new java.util.HashMap[String, Integer]()
    var maxLen = 1
    var id = 0
    for (line <- txt.linesIterator) {
      val p = line.trim
      if (p.nonEmpty) {
        if (!ids.containsKey(p)) ids.put(p, id)
        val raw = if (p.startsWith("##")) p.substring(2) else p
        val n = raw.codePointCount(0, raw.length)
        if (n > maxLen) maxLen = n
        id += 1
      }
    }
    val unk = ids.get(Unk)
    new Vocab(ids, maxLen, if (unk == null) -1 else unk.intValue())
  }

  /** One word's codepoint boundaries: offsets(i) = UTF-16 index of
    * codepoint i, offsets(n) = word.length. */
  private def cpOffsets(word: String): Array[Int] = {
    val out = new ArrayBuffer[Int](word.length + 1)
    var i = 0
    while (i < word.length) {
      out += i
      i += Character.charCount(word.codePointAt(i))
    }
    out += word.length
    out.toArray
  }

  /** Greedy longest-match-first encode of ONE word (the published
    * WordPiece loop): returns the piece strings, or `[ [UNK] ]` when
    * the word is over-long or dead-ends. Pieces at position 0 must NOT
    * carry the `##` marker; later pieces MUST — the marker is
    * positional, so a vocab line literally starting with `##` can only
    * ever match as a continuation (the published convention's
    * ambiguity, resolved the way BERT's reference code does). */
  def encodeWord(word: String, vocab: Vocab): Array[String] = {
    val offs = cpOffsets(word)
    val n = offs.length - 1
    if (n == 0) return Array.empty
    if (n > MaxWordChars) return Array(Unk)
    val out = new ArrayBuffer[String](4)
    var pos = 0
    while (pos < n) {
      var end = math.min(n, pos + vocab.maxPieceChars)
      var found: String = null
      while (found == null && end > pos) {
        val raw = word.substring(offs(pos), offs(end))
        val cand = if (pos == 0) raw else "##" + raw
        if ((pos > 0 || !raw.startsWith("##")) && vocab.ids.containsKey(cand))
          found = cand
        else end -= 1
      }
      if (found == null) return Array(Unk)
      out += found
      pos = end
    }
    out.toArray
  }

  /** Encode a text to piece strings; `cache` memoizes per distinct
    * word (the [[BpeCodec.encodeTokens]] posture). */
  def encodePieces(text: String, vocab: Vocab,
                   cache: java.util.HashMap[String, Array[String]]): Array[String] = {
    val words = preTokenize(text)
    val out = new ArrayBuffer[String](words.length * 2)
    var i = 0
    while (i < words.length) {
      val w = words(i)
      var ps = cache.get(w)
      if (ps == null) {
        ps = encodeWord(w, vocab)
        if (cache.size >= (1 << 16)) cache.clear() // bound task memory
        cache.put(w, ps)
      }
      out ++= ps
      i += 1
    }
    out.toArray
  }

  /** Encode to vocab.txt line ids; [UNK] missing from the vocab maps
    * to -1 (loud and countable). */
  def encodeIds(text: String, vocab: Vocab,
                cache: java.util.HashMap[String, Array[String]]): Array[Int] = {
    val ps = encodePieces(text, vocab, cache)
    val out = new Array[Int](ps.length)
    var i = 0
    while (i < ps.length) {
      val id = vocab.ids.get(ps(i))
      out(i) = if (id == null) -1 else id.intValue()
      i += 1
    }
    out
  }
}

/** `graft_wp_tokens(text, vocabTxt)` — WordPiece greedy
  * longest-match-first encode to piece strings ([[WpCodec]]); vocabTxt
  * is the published one-piece-per-line `vocab.txt` format. */
case class WordPieceTokens(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_wp_tokens"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (left.dataType == StringType && right.dataType == StringType && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (STRING text, foldable STRING vocabTxt), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  @transient private lazy val vocab =
    WpCodec.parseVocab(right.eval().asInstanceOf[UTF8String].toString)
  @transient private lazy val cache =
    new java.util.HashMap[String, Array[String]]()

  override def nullSafeEval(text: Any, v: Any): Any = {
    val toks = WpCodec.encodePieces(
      text.asInstanceOf[UTF8String].toString, vocab, cache)
    val out = new Array[AnyRef](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_wp_ids(text, vocabTxt)` — WordPiece encode to `vocab.txt`
  * LINE ids (the BERT convention — published vocab files drop in);
  * `[UNK]` absent from the vocab yields -1. */
case class WordPieceIds(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_wp_ids"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (left.dataType == StringType && right.dataType == StringType && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (STRING text, foldable STRING vocabTxt)")
  }

  @transient private lazy val vocab =
    WpCodec.parseVocab(right.eval().asInstanceOf[UTF8String].toString)
  @transient private lazy val cache =
    new java.util.HashMap[String, Array[String]]()

  override def nullSafeEval(text: Any, v: Any): Any =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      WpCodec.encodeIds(text.asInstanceOf[UTF8String].toString, vocab, cache))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
