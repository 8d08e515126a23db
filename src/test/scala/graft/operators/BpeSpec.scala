package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.expressions.BpeCodec

/** Exact BPE: greedy lowest-rank merging over GPT-2's BYTE-LEVEL
  * alphabet (bytes_to_unicode — hand-checked pins against the published
  * table so a public merges.txt gives identical counts on all text),
  * GPT-2 merges-file format round-trip, deterministic training, and the
  * canonical-table pin that keeps the embedded q84 table equal to what
  * the trainer produces on the corpus. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def count(text: String, merges: Seq[(String, String)]): Long =
    BpeCodec.countTokens(text,
      BpeCodec.ranksOf(merges.toArray), new java.util.HashMap[String, Integer]())

  test("greedy merge follows rank order, not text order") {
    // rank 0 (b,c) fires before (a,b) even though (a,b) appears first:
    // "abc" -> [a, bc] (2 tokens); with the ranks swapped -> [ab, c] then
    // [abc] via (ab,c)
    assert(count("abc", Seq(("b", "c"), ("a", "b"))) == 2)
    assert(count("abc", Seq(("a", "b"), ("ab", "c"))) == 1)
  }

  test("all occurrences of the chosen pair merge in one pass, left-greedy") {
    assert(count("aaa", Seq(("a", "a"))) == 2)   // [aa, a]
    assert(count("aaaa", Seq(("a", "a"))) == 2)  // [aa, aa] -> (aa,aa)? not in table
    assert(count("aaaa", Seq(("a", "a"), ("aa", "aa"))) == 1)
  }

  test("merge chains: 'lower' under l+o, lo+w, e+r") {
    val m = Seq(("l", "o"), ("lo", "w"), ("e", "r"))
    assert(count("lower", m) == 2) // [low, er]
    assert(count("low", m) == 1)
    assert(count("xyz", m) == 3) // untouched: one token per code point
  }

  test("whitespace words encode independently; empty text is 0 tokens") {
    val m = Seq(("a", "b"))
    assert(count("ab ab  ab", m) == 3)
    assert(count("", m) == 0L)
    assert(count("   ", m) == 0L)
  }

  test("BYTE-level alphabet: words seed as UTF-8 bytes mapped through " +
    "GPT-2's bytes_to_unicode, exactly as the published encoder") {
    // the published table's fixed points and remaps (GPT-2 encoder.py):
    // printable bytes map to themselves; controls/space/DEL/0xAD shift
    // to U+0100+n in ascending byte order
    assert(BpeCodec.byteSymbols('A'.toInt) == "A")
    assert(BpeCodec.byteSymbols(0xC3) == "Ã") // Ã maps to itself
    assert(BpeCodec.byteSymbols(0xA9) == "©") // © maps to itself
    assert(BpeCodec.byteSymbols(32) == "Ġ")   // space -> Ġ
    assert(BpeCodec.byteSymbols(10) == "Ċ")   // \n -> Ċ
    assert(BpeCodec.byteSymbols(0) == "Ā")    // NUL -> Ā
    assert(BpeCodec.byteSymbols(0xAD) == "Ń") // soft hyphen -> Ń
    assert(BpeCodec.byteSymbols.distinct.length == 256)
    // "café" = bytes [c a f 0xC3 0xA9] -> symbols [c, a, f, Ã, ©]:
    // 5 tokens with no merges (GPT-2's own seeding, hand-checked
    // against the published algorithm — NOT 4 code points)
    assert(count("café", Nil) == 5)
    // merges operate on the byte symbols: (Ã,©) then (c,a) -> [ca, f, Ã©]
    assert(count("café", Seq(("Ã", "©"), ("c", "a"))) == 3)
    // an astral symbol is 4 UTF-8 bytes -> 4 seed tokens
    val clef = new String(Character.toChars(0x1D11E)) // 2 Java chars
    assert(count(s"x${clef}y", Nil) == 6)
    // a merges table that re-joins the clef's first byte pair
    val b = clef.getBytes("UTF-8").map(x => BpeCodec.byteSymbols(x & 0xFF))
    assert(count(s"x${clef}y", Seq((b(0), b(1)))) == 5)
  }

  test("GPT-2 merges file format round-trips, headers skipped") {
    val content = "#version: 0.2\ne r\ner s\n\nt h\n"
    val parsed = BpeCodec.parseMerges(content)
    assert(parsed.toSeq == Seq(("e", "r"), ("er", "s"), ("t", "h")))
    assert(BpeCodec.parseMerges(
      BpeCodec.formatMerges(parsed.toSeq)).toSeq == parsed.toSeq)
    assert(TextAnalysis.bpeLoadMerges(content) == parsed.toSeq)
  }

  test("more merges never increase the token count; zero merges count " +
    "UTF-8 bytes") {
    val docs = graft.Tables(spark, TestSpark.sfDir, "documents").limit(60)
    val table = graft.SparkEntry.bpeCanonicalMerges
    val counts = (0 to table.length by 8).map { k =>
      docs.agg(sum(TextAnalysis.bpeTokenCountExact(col("text"), table.take(k))))
        .head().getLong(0)
    }
    assert(counts == counts.sorted.reverse, counts)
    val bytes = docs
      .agg(sum(expr("octet_length(regexp_replace(text, '\\\\s+', ''))")))
      .head().getLong(0)
    assert(counts.head == bytes) // k=0: every non-space UTF-8 byte a token
    assert(counts.last < counts.head) // the table actually compresses
  }

  test("the embedded canonical table IS bpeTrain's output on the corpus " +
    "it claims (sf0.01 documents, 32 merges)") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val trained = TextAnalysis.bpeTrain(docs, "text", 32)
    assert(trained == graft.SparkEntry.bpeCanonicalMerges)
  }

  test("full encode: token sequences in order, size(tokens) == count, " +
    "byte-level symbols survive verbatim") {
    import spark.implicits._
    def toks(text: String, merges: Seq[(String, String)]): Seq[String] = {
      val cache = new java.util.HashMap[String, Array[String]]()
      BpeCodec.encodeTokens(text, BpeCodec.ranksOf(merges.toArray), cache).toSeq
    }
    val m = Seq(("l", "o"), ("lo", "w"), ("e", "r"))
    assert(toks("lower low xyz", m) == Seq("low", "er", "low", "x", "y", "z"))
    assert(toks("", m).isEmpty)
    // byte-level: café's accent stays two byte symbols absent a merge
    assert(toks("café", Nil) == Seq("c", "a", "f", "Ã", "©"))
    // the expression agrees with the codec and with graft_bpe_count
    val table = graft.SparkEntry.bpeCanonicalMerges
    val docs = graft.Tables(spark, TestSpark.sfDir, "documents").limit(40)
    val rows = docs.select(
      TextAnalysis.bpeTokensExact(col("text"), table).as("ts"),
      TextAnalysis.bpeTokenCountExact(col("text"), table).as("n"),
      col("text")).collect()
    for (r <- rows) {
      assert(r.getSeq[String](0).size.toLong == r.getLong(1))
      val cache = new java.util.HashMap[String, Array[String]]()
      assert(r.getSeq[String](0) == BpeCodec.encodeTokens(r.getString(2),
        BpeCodec.ranksOf(table.toArray), cache).toSeq)
    }
  }

  test("encoder.json vocab: parse/format round-trip incl. \\u escapes " +
    "and whitespace; ids map in order, unknown -> -1; the canonical " +
    "vocab closes over the trainer's merges") {
    import spark.implicits._
    val vocab = Seq("low" -> 300, "er" -> 301, "\u0120" -> 32, "a\"b\\c" -> 5)
    val parsed = BpeCodec.parseVocabJson(BpeCodec.formatVocabJson(vocab))
    assert(vocab.forall { case (t, id) => parsed.get(t) == Int.box(id) })
    // real-file shapes: \uXXXX escapes, whitespace, negative numbers
    val real = "{\n  \"\\u0120the\": 262 , \"x\": 87, \"neg\": -3\n}"
    assert(BpeCodec.parseVocabJson(real).get("\u0120the") == Int.box(262))
    assert(BpeCodec.parseVocabJson(real).get("neg") == Int.box(-3))
    assert(BpeCodec.parseVocabJson("{}").isEmpty)
    intercept[IllegalArgumentException](BpeCodec.parseVocabJson("{\"a\" 1}"))
    intercept[IllegalArgumentException](BpeCodec.parseVocabJson("[1,2]"))
    // the expression maps tokens positionally; unvocabed tokens read -1
    val m = Seq(("l", "o"), ("lo", "w"), ("e", "r"))
    val ids = Seq("lower low zz").toDF("t").select(
      TextAnalysis.bpeIdsExact(col("t"), m,
        Seq("low" -> 7, "er" -> 8, "z" -> 9))).head().getSeq[Int](0)
    assert(ids == Seq(7, 8, 7, 9, 9))
    // canonicalVocab(merges) covers every token the merges can emit:
    // zero unknowns across the corpus
    val table = graft.SparkEntry.bpeCanonicalMerges
    val docs = graft.Tables(spark, TestSpark.sfDir, "documents").limit(40)
    val unk = docs.select(explode(TextAnalysis.bpeIdsExact(col("text"),
        table, BpeCodec.canonicalVocab(table))).as("id"))
      .filter(col("id") === -1).count()
    assert(unk == 0)
  }

  test("expression == codec on fixture text (cache on and off paths)") {
    val docs = graft.Tables(spark, TestSpark.sfDir, "documents").limit(40)
    val table = graft.SparkEntry.bpeCanonicalMerges
    val viaExpr = docs
      .select(col("doc_id"),
        TextAnalysis.bpeTokenCountExact(col("text"), table).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ranks = BpeCodec.ranksOf(table.toArray)
    val viaCodec = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> BpeCodec.countTokens(r.getString(1), ranks,
        new java.util.HashMap[String, Integer]())).toMap
    assert(viaExpr == viaCodec)
  }
}
