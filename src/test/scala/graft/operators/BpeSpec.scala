package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.expressions.BpeCodec

/** Exact BPE: greedy lowest-rank merging (GPT-2 encoder semantics),
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

  test("code points, not UTF-16 chars: astral symbols are one unit") {
    val clef = new String(Character.toChars(0x1D11E)) // 2 Java chars
    assert(count(s"x${clef}y", Nil) == 3)
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
    "code points") {
    val docs = graft.Tables(spark, TestSpark.sfDir, "documents").limit(60)
    val table = graft.SparkEntry.bpeCanonicalMerges
    val counts = (0 to table.length by 8).map { k =>
      docs.agg(sum(TextAnalysis.bpeTokenCountExact(col("text"), table.take(k))))
        .head().getLong(0)
    }
    assert(counts == counts.sorted.reverse, counts)
    val codepoints = docs.agg(sum(length(regexp_replace(col("text"), "\\s+", ""))))
      .head().getLong(0)
    assert(counts.head == codepoints) // k=0: every code point a token
    assert(counts.last < counts.head) // the table actually compresses
  }

  test("the embedded canonical table IS bpeTrain's output on the corpus " +
    "it claims (sf0.01 documents, 32 merges)") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val trained = TextAnalysis.bpeTrain(docs, "text", 32)
    assert(trained == graft.SparkEntry.bpeCanonicalMerges)
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
