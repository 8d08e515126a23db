package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Add-k bigram LM quality scoring (TextAnalysis.bigramLmScore):
  * reference-trained probabilities, OOV smoothing, short-doc handling. */
class BigramLmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def score(docs: (Long, String, Boolean)*): Map[Long, (Long, Option[Double])] =
    TextAnalysis.bigramLmScore(
        docs.toDF("doc_id", "text", "ref"), "doc_id", "text", col("ref"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap

  test("in-model text outscores out-of-vocabulary text") {
    val got = score(
      (1L, "the cat sat on the mat", true),
      (2L, "the cat sat on the mat", false), // verbatim in-model: same score
      (3L, "zq xv qq zz vv xx", false)) // fully OOV
    assert(got(1L)._1 === 5L && got(3L)._1 === 5L)
    assert(got(1L)._2 === got(2L)._2)
    assert(got(1L)._2.get > got(3L)._2.get,
      s"in-model ${got(1L)._2} should beat OOV ${got(3L)._2}")
  }

  test("repeated reference bigrams raise the score of text that uses them") {
    val ref = "a b a b a b c d" // c(a,b)=3 dominates; (c,d)=1
    val got = score(
      (10L, ref, true),
      (11L, "a b a b", false), // only the frequent bigram
      (12L, "c d c d", false)) // the rare bigram + an unseen (d,c)
    assert(got(11L)._2.get > got(12L)._2.get)
  }

  test("documents with fewer than two tokens score null with zero bigrams") {
    val got = score((1L, "a b c", true), (2L, "solo", false))
    assert(got(2L) === ((0L, None)))
  }

  private def knScore(docs: (Long, String, Boolean)*): Map[Long, (Long, Option[Double])] =
    TextAnalysis.knBigramScore(
        docs.toDF("doc_id", "text", "ref"), "doc_id", "text", col("ref"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap

  test("kneser-ney: hand-computed probability on a tiny model") {
    // model "a b a b a c" -> bigrams (a,b)x2, (b,a)x2, (a,c)x1
    // c1(a)=3, n1p(a)=2; c1(b)=2, n1p(b)=1
    // n1l = 1 for each of a,b,c; T=3 types; V=3 unigrams
    // Pcont(w) = (n1l+0.5)/(T+0.5*(V+1)) = 1.5/5 = 0.3 for a,b,c
    // scored doc "a b a c": P(b|a), P(a|b), P(c|a)
    val pAB = (2 - 0.75) / 3 + 0.75 * 2 / 3 * 0.3 // = 0.566667
    val pBA = (2 - 0.75) / 2 + 0.75 * 1 / 2 * 0.3 // = 0.7375
    val pAC = (1 - 0.75) / 3 + 0.75 * 2 / 3 * 0.3 // = 0.233333
    val expected = BigDecimal(
        (math.log(pAB) + math.log(pBA) + math.log(pAC)) / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = knScore((1L, "a b a b a c", true), (2L, "a b a c", false))
    assert(got(2L)._1 == 3L)
    assert(math.abs(got(2L)._2.get - expected) < 1e-9,
      s"got ${got(2L)._2}, expected $expected")
  }

  test("kneser-ney: continuation counts beat raw frequency (the " +
    "Francisco property) and OOV contexts back off, in-model beats OOV") {
    // "francisco" is frequent but ALWAYS follows "san"; "day" is seen
    // in three different contexts with the same total count. After an
    // UNSEEN context, KN must prefer "day" (high continuation count)
    // over "francisco" (continuation count 1)
    val model = "san francisco san francisco san francisco " +
      "good day nice day every day"
    val got = knScore(
      (1L, model, true),
      (2L, "zzz francisco", false), // unseen ctx -> Pcont(francisco)
      (3L, "zzz day", false)) // unseen ctx -> Pcont(day)
    assert(got(3L)._2.get > got(2L)._2.get,
      s"Pcont(day) ${got(3L)._2} must beat Pcont(francisco) ${got(2L)._2}")
    val got2 = knScore(
      (1L, "the cat sat on the mat", true),
      (4L, "the cat sat on the mat", false),
      (5L, "zq xv qq zz vv xx", false))
    assert(got2(4L)._2.get > got2(5L)._2.get)
  }
}
