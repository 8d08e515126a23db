package graft.expressions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM tokenization (Kudo 2018, "Subword Regularization" —
  * SentencePiece's `--model_type=unigram`, the fourth dominant
  * published tokenizer family beside GPT-2 byte-level BPE
  * ([[BpeCodec]]), SentencePiece BPE ([[SpCodec]]) and WordPiece
  * ([[WpCodec]])): each piece carries a LOG PROBABILITY and encoding
  * is the VITERBI segmentation — the piece sequence maximizing
  * Σ log p(piece) — not a merge loop or a greedy scan.
  *
  * Declared contract (total, deterministic):
  *   - pre-tokenization is whitespace ([[WpCodec.preTokenize]], the
  *     house tokenizer contract);
  *   - the vocab format is the published SentencePiece `.vocab` text
  *     dump: one `piece<TAB>logprob` line per piece, id = line number
  *     — a `spm_export_vocab` file drops in unchanged;
  *   - log probabilities are quantized ONCE to integer MICRO-NATS
  *     (`round(lp·1e6)`), so every Viterbi comparison and every score
  *     this engine reports is exact integer arithmetic — bit-stable
  *     across engines, partitions and reruns;
  *   - the Viterbi objective is the single integer
  *     `64·Σlp_micro − n_pieces`: ties in total log-prob resolve to
  *     FEWER pieces, and remaining ties to the longest final piece at
  *     each DP cell (scan order pins it) — a total order, so the
  *     segmentation is unique by construction;
  *   - single-codepoint pieces absent from the vocab score
  *     [[UgCodec.UnkLpMicro]] (character fallback — every word
  *     segments; out-of-vocab characters surface as `-1` ids);
  *   - words longer than [[UgCodec.MaxWordChars]] codepoints skip the
  *     DP and emit per-codepoint fallback pieces (the bounded-work
  *     guarantee; BERT's over-long-word posture, segmenting instead
  *     of [UNK]).
  *
  * Reference behavior per bearysta's scope: none — the reference has
  * no tokenizer; this completes the four-family tokenizer surface. */
object UgCodec {

  /** Words over this many codepoints bypass the DP (per-char pieces). */
  val MaxWordChars = 32

  /** Character-fallback log probability, micro-nats (≈ e^-20 — far
    * below any trained piece). */
  val UnkLpMicro: Long = -20000000L

  final class Vocab(val lpMicro: java.util.HashMap[String, java.lang.Long],
                    val ids: java.util.HashMap[String, Integer],
                    val maxPieceChars: Int)

  /** Parse the `.vocab` text format (`piece<TAB>logprob` lines, id =
    * line number; first occurrence wins on duplicates; blank lines
    * skipped). Log-probs quantize to micro-nats here, once. */
  def parseVocab(txt: String): Vocab = {
    val lp = new java.util.HashMap[String, java.lang.Long]()
    val ids = new java.util.HashMap[String, Integer]()
    var maxLen = 1
    var id = 0
    for (line <- txt.linesIterator) {
      if (line.nonEmpty) {
        val tab = line.indexOf('\t')
        if (tab <= 0) throw new IllegalArgumentException(
          s"unigram vocab line $id: expected 'piece<TAB>logprob', got '$line'")
        val piece = line.substring(0, tab)
        val v = java.lang.Double.parseDouble(line.substring(tab + 1).trim)
        if (!ids.containsKey(piece)) {
          ids.put(piece, id)
          lp.put(piece, Math.round(v * 1e6))
          val n = piece.codePointCount(0, piece.length)
          if (n > maxLen) maxLen = n
        }
        id += 1
      }
    }
    new Vocab(lp, ids, maxLen)
  }

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

  /** Viterbi-encode ONE word; returns the piece strings of the unique
    * argmax segmentation under the declared objective. */
  def encodeWord(word: String, vocab: Vocab): Array[String] = {
    val offs = cpOffsets(word)
    val n = offs.length - 1
    if (n == 0) return Array.empty
    if (n > MaxWordChars) {
      // bounded-work fallback: one piece per codepoint
      val out = new Array[String](n)
      var i = 0
      while (i < n) { out(i) = word.substring(offs(i), offs(i + 1)); i += 1 }
      return out
    }
    val best = Array.fill(n + 1)(Long.MinValue)
    val back = new Array[Int](n + 1)
    best(0) = 0L
    var p = 1
    while (p <= n) {
      var j = math.max(0, p - vocab.maxPieceChars)
      while (j < p) {
        if (best(j) != Long.MinValue) {
          val piece = word.substring(offs(j), offs(p))
          val lpBoxed = vocab.lpMicro.get(piece)
          val lp: java.lang.Long =
            if (lpBoxed != null) lpBoxed
            else if (p - j == 1) UnkLpMicro
            else null
          if (lp != null) {
            // ascending j: at equal objective the FIRST (longest-piece)
            // candidate stays — the declared tie order
            val cand = best(j) + lp.longValue() * 64L - 1L
            if (cand > best(p)) { best(p) = cand; back(p) = j }
          }
        }
        j += 1
      }
      p += 1
    }
    // char fallback guarantees reachability
    val rev = new ArrayBuffer[String](4)
    var pos = n
    while (pos > 0) {
      val j = back(pos)
      rev += word.substring(offs(j), offs(pos))
      pos = j
    }
    rev.reverseIterator.toArray
  }

  /** Encode a text: pieces, vocab line ids (fallback chars absent from
    * the vocab → -1), and the exact micro-nat score Σlp. `cache`
    * memoizes per distinct word (the [[BpeCodec]] posture). */
  def encode(text: String, vocab: Vocab,
             cache: java.util.HashMap[String, Array[String]])
      : (Array[String], Array[Int], Long) = {
    val words = WpCodec.preTokenize(text)
    val pieces = new ArrayBuffer[String](words.length * 2)
    var w = 0
    while (w < words.length) {
      val word = words(w)
      var ps = cache.get(word)
      if (ps == null) {
        ps = encodeWord(word, vocab)
        if (cache.size >= (1 << 16)) cache.clear()
        cache.put(word, ps)
      }
      pieces ++= ps
      w += 1
    }
    val ids = new Array[Int](pieces.length)
    var score = 0L
    var i = 0
    while (i < pieces.length) {
      val id = vocab.ids.get(pieces(i))
      ids(i) = if (id == null) -1 else id.intValue()
      val lp = vocab.lpMicro.get(pieces(i))
      score += (if (lp == null) UnkLpMicro else lp.longValue())
      i += 1
    }
    (pieces.toArray, ids, score)
  }
}

/** `graft_ug_encode(text, vocabTxt)` — Unigram-LM Viterbi encode to
  * `STRUCT(pieces ARRAY<STRING>, ids ARRAY<INT>, score_micro BIGINT)`
  * ([[UgCodec]]); vocabTxt is the published SentencePiece `.vocab`
  * dump (`piece<TAB>logprob` lines). */
case class UnigramEncode(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("pieces", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("ids", ArrayType(IntegerType, containsNull = false),
      nullable = false),
    StructField("score_micro", LongType, nullable = false)))

  override def prettyName: String = "graft_ug_encode"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (left.dataType == StringType && right.dataType == StringType && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (STRING text, foldable STRING vocabTxt), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  @transient private lazy val vocab =
    UgCodec.parseVocab(right.eval().asInstanceOf[UTF8String].toString)
  @transient private lazy val cache =
    new java.util.HashMap[String, Array[String]]()

  override def nullSafeEval(text: Any, v: Any): Any = {
    val (pieces, ids, score) = UgCodec.encode(
      text.asInstanceOf[UTF8String].toString, vocab, cache)
    val ps = new Array[AnyRef](pieces.length)
    var i = 0
    while (i < pieces.length) {
      ps(i) = UTF8String.fromString(pieces(i)); i += 1
    }
    InternalRow(new GenericArrayData(ps), ArrayData.toArrayData(ids), score)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
