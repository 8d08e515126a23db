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
}
