package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Unigram-LM tokenizer (UgCodec + graft_ug_encode): vocab parsing,
  * hand-checked Viterbi incl. every declared tie rule, character and
  * over-long fallbacks, score/id consistency through the expression,
  * and the canonical-vocab pin against the trainer. */
class UnigramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def vocabOf(entries: (String, Double)*): UgCodec.Vocab =
    UgCodec.parseVocab(entries.map { case (p, lp) => s"$p\t$lp" }
      .mkString("\n"))

  test("parseVocab: micro quantization, line ids, duplicate and " +
    "malformed handling") {
    val v = UgCodec.parseVocab("ab\t-1.25\ncd\t-2.5\nab\t-9.0\ne\t-0.125")
    assert(v.lpMicro.get("ab") == -1250000L) // first occurrence wins
    assert(v.lpMicro.get("cd") == -2500000L)
    assert(v.ids.get("ab") == 0 && v.ids.get("cd") == 1 && v.ids.get("e") == 3)
    assert(v.maxPieceChars == 2)
    intercept[IllegalArgumentException](UgCodec.parseVocab("nopiece"))
  }

  test("viterbi picks the max-log-prob segmentation, not the greedy one") {
    // greedy longest-match would take "abc" (-5); viterbi takes ab+c (-2)
    val v = vocabOf("abc" -> -5.0, "ab" -> -1.0, "a" -> -2.0,
      "b" -> -2.0, "c" -> -1.0)
    assert(UgCodec.encodeWord("abc", v).toSeq == Seq("ab", "c"))
    // but when the long piece IS cheaper, it wins
    val v2 = vocabOf("abc" -> -1.0, "ab" -> -1.0, "c" -> -1.0)
    assert(UgCodec.encodeWord("abc", v2).toSeq == Seq("abc"))
  }

  test("tie rules: equal score prefers fewer pieces, then the longer " +
    "final piece") {
    // "ab"+"cd" and "abcd" both score -2.0 -> fewer pieces wins
    val v = vocabOf("abcd" -> -2.0, "ab" -> -1.0, "cd" -> -1.0)
    assert(UgCodec.encodeWord("abcd", v).toSeq == Seq("abcd"))
    // "a"+"bc" and "ab"+"c" both -2.0, both 2 pieces -> the DP cell at
    // the word end prefers the LONGER final piece: "a"+"bc"
    val v2 = vocabOf("a" -> -1.0, "bc" -> -1.0, "ab" -> -1.0, "c" -> -1.0)
    assert(UgCodec.encodeWord("abc", v2).toSeq == Seq("a", "bc"))
  }

  test("character fallback scores UnkLpMicro and never dead-ends; " +
    "over-long words take per-codepoint pieces") {
    val v = vocabOf("ab" -> -1.0, "a" -> -2.0)
    // 'z' is out of vocab: falls back at UnkLpMicro, word still segments
    assert(UgCodec.encodeWord("azb", v).toSeq == Seq("a", "z", "b"))
    val long = "ab" * 20 // 40 > MaxWordChars
    val got = UgCodec.encodeWord(long, v)
    assert(got.length == 40 && got.forall(_.length == 1))
    // codepoint arithmetic: an astral-plane char is ONE piece
    val astral = UgCodec.encodeWord("a😀b", v)
    assert(astral.toSeq == Seq("a", "😀", "b"))
  }

  test("expression: pieces/ids/score agree with the codec, fallback " +
    "ids are -1, score is the exact micro sum") {
    import spark.implicits._
    val vocab = Seq("ab\t-1.0", "a\t-2.0", "b\t-2.0", "c\t-1.5")
    val out = Seq((1L, "ab c zq"), (2L, ""), (3L, "   "))
      .toDF("id", "t")
      .select(col("id"),
        graft.operators.TextAnalysis.unigramEncode(col("t"), vocab).as("e"))
      .select(col("id"), col("e.pieces"), col("e.ids"), col("e.score_micro"))
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[String](1), r.getSeq[Int](2), r.getLong(3)))).toMap
    assert(out(1L)._1 == Seq("ab", "c", "z", "q"))
    assert(out(1L)._2 == Seq(0, 3, -1, -1))
    assert(out(1L)._3 ==
      -1000000L - 1500000L + 2 * UgCodec.UnkLpMicro)
    assert(out(2L) == ((Seq(), Seq(), 0L)) && out(3L) == ((Seq(), Seq(), 0L)))
  }

  test("canonical vocab pin: UgVocab.lines == unigramVocabTrain on " +
    "sf0.01 documents (96 pieces)") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.01", "documents")
    val trained = graft.operators.TextAnalysis
      .unigramVocabTrain(docs, "text", 96)
    assert(trained == graft.UgVocab.lines,
      "embedded UgVocab drifted from the trainer — rerun " +
        "graft.tools.TrainUgVocab")
  }
}
