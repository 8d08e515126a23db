package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Exact duplicated-span detection (Dedup.duplicateSpans): first-occurrence
  * exemption, span fusion, short-doc handling, and the content-defined
  * sampling knob. */
class DuplicateSpansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def spans(k: Int, mod: Int, docs: (Long, String)*): Set[(Long, Long, Long, Long)] =
    Dedup.duplicateSpans(docs.toDF("doc_id", "text"), "doc_id", "text",
        k = k, sampleMod = mod)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("a shared k-window flags every occurrence except the corpus first") {
    // docs 1 and 2 share tokens "a b c" (k=3) at positions 0 and 2; the
    // corpus-wide first occurrence (doc 1, pos 0) is the kept copy
    val got = spans(3, 1,
      1L -> "a b c x y",
      2L -> "p q a b c")
    assert(got === Set((2L, 2L, 4L, 1L)))
  }

  test("within-doc repetition counts as duplication too") {
    // "a b a b a b": windows (a b a) at 0, (b a b) at 1, (a b a) at 2,
    // (b a b) at 3 — every gram occurs twice; firsts at pos 0 and 1 are
    // exempt, so flagged windows 2,3 fuse into span [2, 5]
    val got = spans(3, 1, 7L -> "a b a b a b")
    assert(got === Set((7L, 2L, 5L, 2L)))
  }

  test("overlapping and coverage-touching windows fuse; distant spans stay apart") {
    // doc 20 repeats doc 10's two separate 3-grams, padded so the two
    // flagged windows sit 4 > k apart and must NOT fuse
    val got = spans(3, 1,
      10L -> "a b c z1 z2 z3 z4 d e f",
      20L -> "a b c w1 w2 w3 w4 d e f")
    assert(got === Set((20L, 0L, 2L, 1L), (20L, 7L, 9L, 1L)))
  }

  test("documents shorter than k windows are skipped, not errored") {
    val got = spans(5, 1, 1L -> "a b c", 2L -> "a b c")
    assert(got.isEmpty)
  }

  private def removed(k: Int, docs: (Long, String)*): Map[Long, (String, Long)] =
    Dedup.removeDuplicateSpans(docs.toDF("doc_id", "text"), "doc_id", "text", k = k)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap

  test("removal cuts flagged spans, keeps the first copy verbatim, passes clean docs through") {
    val got = removed(3,
      1L -> "a b c x y",   // first occurrence of "a b c": kept whole
      2L -> "p q a b c",   // second occurrence: tail cut
      3L -> "u v w x y")   // no duplicated window: verbatim
    assert(got(1L) === ("a b c x y", 0L))
    assert(got(2L) === ("p q", 3L))
    assert(got(3L) === ("u v w x y", 0L))
  }

  test("a fully duplicated document empties to the zero-length string") {
    val text = (1 to 12).map(i => s"w$i").mkString(" ")
    val got = removed(3, 5L -> text, 6L -> text)
    assert(got(5L) === (text, 0L))
    assert(got(6L) === ("", 12L))
  }

  test("sampleMod output is a subset of exact flagged coverage and still finds long spans") {
    // two identical 40-token docs: exact mode flags the whole second doc;
    // any sampled mode must flag a subset of that coverage, and with
    // 31 windows a mod-4 sample finds the span unless all 31 hashes miss
    // the residue — for this fixed corpus the selection is deterministic
    val text = (1 to 40).map(i => s"t$i").mkString(" ")
    val exact = spans(10, 1, 1L -> text, 2L -> text)
    assert(exact === Set((2L, 0L, 39L, 31L)))
    val sampled = spans(10, 4, 1L -> text, 2L -> text)
    assert(sampled.nonEmpty, "content-defined sample missed a 31-window span")
    assert(sampled.forall { case (d, s, e, _) => d == 2L && s >= 0L && e <= 39L })
  }
}
