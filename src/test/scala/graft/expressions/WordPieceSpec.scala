package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.TextAnalysis

/** Exact WordPiece: the published greedy longest-match-first algorithm
  * (Schuster & Nakajima 2012 / BERT tokenization.py), the
  * likelihood-scored trainer, and the canonical-vocab embed pin. */
class WordPieceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def vocabOf(lines: String*): WpCodec.Vocab =
    WpCodec.parseVocab(lines.mkString("\n"))

  test("greedy longest-match-first: longest piece wins, ## is positional") {
    val v = vocabOf("[UNK]", "a", "##b", "aa", "##bc", "b")
    assert(WpCodec.encodeWord("aab", v).toSeq == Seq("aa", "##b"))
    // longest first even when a shorter path would also complete
    assert(WpCodec.encodeWord("aabc", v).toSeq == Seq("aa", "##bc"))
    // 'b' is in the vocab plain, but mid-word only ##b matches
    assert(WpCodec.encodeWord("ab", v).toSeq == Seq("a", "##b"))
    // single initial piece
    assert(WpCodec.encodeWord("b", v).toSeq == Seq("b"))
  }

  test("dead ends map the WHOLE word to [UNK] — no backtracking") {
    val v = vocabOf("[UNK]", "a", "aa", "##b")
    // "aac": aa matches, then 'c' has no ##piece -> whole word UNK
    assert(WpCodec.encodeWord("aac", v).toSeq == Seq("[UNK]"))
    // unknown leading char
    assert(WpCodec.encodeWord("xa", v).toSeq == Seq("[UNK]"))
    // the published no-backtracking property: vocab {a, abc, ##d} on
    // "abcd" takes abc then dead-ends on ##d?  no — ##d IS there: take
    // {a, abc, ##e} instead: greedy takes abc, needs ##d, fails, UNK —
    // even though a + (no ##b) ... either path fails here; construct
    // the classic case: vocab {ab, ##c, a, ##bc} on "abc": greedy takes
    // "ab" then needs "##c" (present) -> ok; on "abcd" with {ab, ##cd
    // absent}: dead end though a+##bc+... also fails
    val v2 = vocabOf("[UNK]", "ab", "a", "##bc", "##c")
    // greedy takes ab + ##c, never explores a + ##bc
    assert(WpCodec.encodeWord("abc", v2).toSeq == Seq("ab", "##c"))
  }

  test("words over 100 codepoints are [UNK]; codepoint arithmetic " +
    "treats surrogate pairs as one char") {
    val v = vocabOf("[UNK]", "a", "##a")
    assert(WpCodec.encodeWord("a" * 100, v).length == 100)
    assert(WpCodec.encodeWord("a" * 101, v).toSeq == Seq("[UNK]"))
    // 𝄞 (U+1D11E) is one codepoint, two UTF-16 units
    val clef = new String(Character.toChars(0x1D11E))
    val v3 = vocabOf("[UNK]", clef, "##a")
    assert(WpCodec.encodeWord(clef + "a", v3).toSeq == Seq(clef, "##a"))
  }

  test("vocab lines literally starting with ## only ever match as " +
    "continuations (the marker is positional)") {
    val v = vocabOf("[UNK]", "#", "###", "a", "##a")
    // word "##a": initial '#' (plain), then ### = continuation "#",
    // then ##a
    assert(WpCodec.encodeWord("##a", v).toSeq == Seq("#", "###", "##a"))
  }

  test("pre-tokenization is \\s+ with empties dropped; ids are " +
    "vocab.txt line numbers; missing [UNK] maps to -1") {
    val v = vocabOf("[UNK]", "a", "##b", "c")
    val cache = new java.util.HashMap[String, Array[String]]()
    assert(WpCodec.encodePieces("ab  c\t\nab", v, cache).toSeq ==
      Seq("a", "##b", "c", "a", "##b"))
    assert(WpCodec.encodeIds("ab c zz", v, cache).toSeq ==
      Seq(1, 2, 3, 0)) // zz dead-ends -> [UNK] id 0
    val noUnk = vocabOf("a", "##b")
    val c2 = new java.util.HashMap[String, Array[String]]()
    assert(WpCodec.encodeIds("zz", noUnk, c2).toSeq == Seq(-1))
    // duplicate vocab lines: first id wins, later line still counted
    val dup = vocabOf("[UNK]", "a", "a", "b")
    assert(dup.ids.get("a") == 1 && dup.ids.get("b") == 3)
  }

  test("trainer: WordPiece score (freq(pair)/(freq(a)freq(b))) with " +
    "exact cross-multiplied comparison and lexicographic ties") {
    val s = spark
    import s.implicits._
    // words: aa x2, ab x1. symbols a:3, ##a:2, ##b:1.
    // pairs (a,##a):2 score 2/(3*2)=1/3; (a,##b):1 score 1/(3*1)=1/3 —
    // an exact tie -> lexicographically smaller pair (a,##a) merges.
    val docs = Seq("aa aa ab").toDF("text")
    val vocab = TextAnalysis.wordPieceTrain(docs, "text", numMerges = 1)
    assert(vocab == Seq("[UNK]", "##a", "##b", "a", "aa"), vocab)
    // a second merge: symbols now aa:2, a:1, ##b:1; only pair (a,##b)
    // count 1 < 2 -> trainer stops (no singleton merges)
    val vocab2 = TextAnalysis.wordPieceTrain(docs, "text", numMerges = 5)
    assert(vocab2 == Seq("[UNK]", "##a", "##b", "a", "aa"), vocab2)
    // the score rule actually differs from BPE's raw frequency: corpus
    // where the most FREQUENT pair loses on likelihood. words: "xy" x4,
    // "zq" x3 plus x,y,z,q noise singles x10 each for x/y only.
    // pairs: (x,##y):4 score 4/(14*14); (z,##q):3 score 3/(3*3)=1/3 —
    // the rarer pair wins on likelihood.
    val docs2 = Seq(Seq.fill(4)("xy"), Seq.fill(3)("zq"),
      Seq.fill(10)("x"), Seq.fill(10)("y")).flatten.mkString(" ")
    val v2 = TextAnalysis.wordPieceTrain(Seq(docs2).toDF("text"), "text",
      numMerges = 1)
    assert(v2.last == "zq", v2) // NOT xy, despite 4 > 3 raw count
  }

  test("trainer warns when maxWords binds; silent otherwise") {
    val s = spark
    import s.implicits._
    val docs = Seq.tabulate(12)(i => s"w$i u$i").toDF("text")
    val warned = scala.collection.mutable.ArrayBuffer.empty[String]
    TextAnalysis.wordPieceTrain(docs, "text", numMerges = 1, maxWords = 8,
      onWarn = warned += _)
    assert(warned.size == 1 && warned.head.contains("top 8"), warned)
    warned.clear()
    TextAnalysis.wordPieceTrain(docs, "text", numMerges = 1,
      onWarn = warned += _)
    assert(warned.isEmpty)
  }

  test("the embedded canonical vocab IS wordPieceTrain's output on the " +
    "corpus it claims (sf0.01 documents, 48 merges)") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val trained = TextAnalysis.wordPieceTrain(docs, "text", 48)
    assert(trained == graft.SparkEntry.wpCanonicalVocab)
  }

  test("the SQL surfaces agree with the codec bit-for-bit") {
    val s = spark
    import s.implicits._
    val vocabLines = Seq("[UNK]", "a", "##b", "aa", "##bc", "c")
    val v = vocabOf(vocabLines: _*)
    val texts = Seq("aab c", "aabc zz", "", "  ", "a" * 101)
    val got = texts.toDF("text")
      .select(
        TextAnalysis.wordPieceTokens(col("text"), vocabLines).as("ps"),
        TextAnalysis.wordPieceIds(col("text"), vocabLines).as("ids"))
      .collect()
    for ((t, r) <- texts.zip(got)) {
      val cache = new java.util.HashMap[String, Array[String]]()
      assert(r.getSeq[String](0) == WpCodec.encodePieces(t, v, cache).toSeq,
        s"pieces drift on '$t'")
      assert(r.getSeq[Int](1) == WpCodec.encodeIds(t, v, cache).toSeq,
        s"ids drift on '$t'")
    }
  }
}
