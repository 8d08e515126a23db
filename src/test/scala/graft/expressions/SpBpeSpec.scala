package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.TextAnalysis

/** SentencePiece-convention BPE ([[SpCodec]]): Metaspace
  * pre-tokenization, character-alphabet greedy merges, `<0xNN>` byte
  * fallback — each pinned by hand-computed vectors, plus the Spark
  * expression path checked bit-equal to the JVM codec. */
class SpBpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // merges: ▁+t, ▁t+he, h+e, i+n, in+g (ranks 0..4)
  private val merges = Seq(("▁", "t"), ("▁t", "he"), ("h", "e"),
    ("i", "n"), ("in", "g"))
  private val vocab = SpCodec.canonicalSpVocab(merges)
  private def ranks = BpeCodec.ranksOf(merges.toArray)

  test("Metaspace pre-tokenizer: dummy prefix, spaces to the marker, " +
    "pieces start with the marker") {
    assert(SpCodec.preTokenize("hello world").toSeq == Seq("▁hello", "▁world"))
    assert(SpCodec.preTokenize("a  b").toSeq == Seq("▁a", "▁", "▁b"))
    assert(SpCodec.preTokenize("").toSeq == Seq("▁"))
    // non-space whitespace stays INSIDE its piece (Metaspace contract)
    assert(SpCodec.preTokenize("a\nb c").toSeq == Seq("▁a\nb", "▁c"))
    // the pieces partition the marked string exactly
    assert(SpCodec.preTokenize("x y z").mkString == "▁x▁y▁z")
  }

  test("character alphabet: codepoint split keeps surrogate pairs whole") {
    assert(SpCodec.splitChars("▁aç").toSeq == Seq("▁", "a", "ç"))
    val emoji = new String(Character.toChars(0x1F600))
    assert(SpCodec.splitChars(s"a$emoji").toSeq == Seq("a", emoji))
  }

  test("hand-computed greedy merges: 'the thing' under the 5-merge table") {
    // ▁the: [▁,t,h,e] -r0-> [▁t,h,e] -r2-> [▁t,he] -r1-> [▁the]
    val cache = new java.util.HashMap[String, Array[String]]()
    assert(SpCodec.encodePieces("the thing", ranks, cache).toSeq ==
      Seq("▁the", "▁t", "h", "ing"))
  }

  test("byte fallback: canonical vocab ids, multi-byte symbols expand, " +
    "no -1 ever") {
    // ▁the=257, ▁t=256, h=<0x68>=104, ing=260
    val cache = new java.util.HashMap[String, Array[String]]()
    val v = BpeCodec.parseVocabJson(BpeCodec.formatVocabJson(vocab))
    assert(SpCodec.encodeIds("the thing", ranks, v, cache).toSeq ==
      Seq(257, 256, 104, 260))
    // empty text = one bare marker piece -> its three UTF-8 bytes
    assert(SpCodec.encodeIds("", ranks, v, cache).toSeq == Seq(226, 150, 129))
    // ç (U+00E7) -> C3 A7 after the marker's bytes
    assert(SpCodec.encodeIds("ç", ranks, v, cache).toSeq ==
      Seq(226, 150, 129, 195, 167))
    assert(SpCodec.byteFallback("▁").toSeq == Seq("<0xE2>", "<0x96>", "<0x81>"))
  }

  test("expression path is bit-equal to the JVM codec over the corpus") {
    import spark.implicits._
    val docs = graft.Tables(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("text")).limit(64)
    val got = docs.select(col("doc_id"),
        TextAnalysis.spTokensExact(col("text"), merges).as("toks"),
        TextAnalysis.spIdsExact(col("text"), merges, vocab).as("ids"))
      .collect()
    val texts = docs.as[(Long, String)].collect().toMap
    val cache = new java.util.HashMap[String, Array[String]]()
    val v = BpeCodec.parseVocabJson(BpeCodec.formatVocabJson(vocab))
    got.foreach { r =>
      val t = texts(r.getLong(0))
      assert(r.getSeq[String](1) == SpCodec.encodePieces(t, ranks, cache).toSeq)
      assert(r.getSeq[Int](2) == SpCodec.encodeIds(t, ranks, v, cache).toSeq)
      // ids never contain the -1 sentinel under the canonical vocab
      assert(!r.getSeq[Int](2).contains(-1))
    }
    // piece concatenation reconstructs the marked text (losslessness)
    got.foreach { r =>
      val t = texts(r.getLong(0))
      assert(r.getSeq[String](1).mkString == "▁" + t.replace(' ', '▁'))
    }
  }
}
