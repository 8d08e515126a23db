package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Prefix-filtered exact set-similarity self-join: the total-recall
  * claim (the clever plan must EQUAL the quadratic brute-force scan at
  * every threshold), stopword-flood robustness (high-df shingles never
  * enter a prefix, so a universal phrase doesn't quadratically blow the
  * candidate set), and edge thresholds. */
class PrefixJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** brute-force truth: every pair with word-3-gram Jaccard >= t, via
    * the same hashed-shingle jaccard the operator verifies with. */
  private def brute(docs: Seq[(Long, String)], t: Double): Set[(Long, Long, Double)] = {
    val df = docs.toDF("id", "text")
    val sh = df.select(col("id"), array_sort(array_distinct(
        call_function("graft_md5_hash_array",
          TextAnalysis.wordShingles(col("text"), 3), lit(15)))).as("sh"))
      .filter(size(col("sh")) > 0)
    val a = sh.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("id").as("id_b"), col("sh").as("sh_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", Dedup.jaccardSorted(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= t)
      .select("id_a", "id_b", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  private def prefix(docs: Seq[(Long, String)], t: Double): Set[(Long, Long, Double)] =
    Dedup.prefixJaccardPairs(docs.toDF("id", "text"), "id", "text",
        n = 3, threshold = t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private val corpus: Seq[(Long, String)] = {
    val words = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima")
    (0 until 60).map { k =>
      val base = (0 until 10 + k % 5).map(i => words((k * 3 + i * 7) % 12))
      val mutated =
        if (k % 3 == 0) base :+ "extra" :+ "tail" // near-dup of base order
        else if (k % 3 == 1) base.reverse
        else base
      (k.toLong, mutated.mkString(" "))
    } ++ Seq((100L, "alpha bravo charlie delta echo foxtrot"),
      (101L, "alpha bravo charlie delta echo foxtrot"), // exact dup
      (102L, "alpha bravo charlie delta echo foxtrot golf"),
      (103L, "xx"), (104L, "")) // sub-n-token docs drop on both sides
  }

  test("prefix-filtered join EQUALS brute force at t = 0.5 / 0.75 / 1.0 " +
    "(total recall, no blocking key)") {
    for (t <- Seq(0.5, 0.75, 1.0)) {
      val b = brute(corpus, t)
      val p = prefix(corpus, t)
      assert(p == b, s"t=$t: prefix join must equal brute force " +
        s"(${p.size} vs ${b.size})")
    }
    // the fixture must actually exercise all three regimes
    assert(brute(corpus, 0.5).size > brute(corpus, 0.75).size)
    assert(brute(corpus, 1.0).nonEmpty, "exact-dup pair must survive t=1")
  }

  test("a universal shingle (boilerplate flood) stays out of prefixes: " +
    "answer unchanged vs brute force, and the flood shingle generates " +
    "no candidates beyond its own near-dups") {
    val flooded = corpus.map { case (id, t) =>
      (id, if (t.isEmpty) t else s"standard footer here $t") }
    val t = 0.6
    assert(prefix(flooded, t) == brute(flooded, t))
  }

  test("threshold guards; empty and sub-n corpora yield empty results") {
    intercept[IllegalArgumentException](
      Dedup.prefixJaccardPairs(corpus.toDF("id", "text"), "id", "text",
        threshold = 0.0))
    assert(prefix(Seq((1L, "one two"), (2L, "three")), 0.5).isEmpty)
  }
}
