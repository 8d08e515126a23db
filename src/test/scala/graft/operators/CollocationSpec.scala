package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[TextAnalysis.pmiCollocations]]: PMI arithmetic against a
  * plain-Scala mirror, short-document and minCount edges, and the
  * global-top-k plan shape. */
class CollocationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    "new york new york city",
    "new york is big",
    "big city life",
    "", // 0 tokens: no bigrams, contributes 0 to T and B
    "x" // 1 token: no bigrams, counts in T
  ).toDF("text")

  private def mirror(texts: Seq[String], minCount: Long): Map[(String, String), Double] = {
    val toks = texts.map(_.trim.split("\\s+").filter(_.nonEmpty).toSeq)
    val t = toks.map(_.size).sum.toDouble
    val b = toks.map(ts => math.max(ts.size - 1, 0)).sum.toDouble
    val uni = toks.flatten.groupBy(identity).map { case (w, o) => w -> o.size.toDouble }
    toks.flatMap(ts => ts.zip(ts.drop(1))).groupBy(identity)
      .filter(_._2.size >= minCount)
      .map { case (pair, occ) =>
        val pmi = math.log((occ.size / b) / ((uni(pair._1) / t) * (uni(pair._2) / t)))
        pair -> BigDecimal(pmi).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
  }

  test("pmi matches the plain-Scala mirror; short docs count in T only") {
    val out = TextAnalysis.pmiCollocations(docs, "text", minCount = 1L, k = 100)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    val want = mirror(docs.collect().map(_.getString(0)).toSeq, 1L)
    assert(out.keySet == want.keySet)
    for ((p, w) <- want) assert(math.abs(out(p) - w) < 1e-9, s"$p: ${out(p)} vs $w")
    // "new york" occurs 3x and must outrank any singleton pair
    val ranked = TextAnalysis.pmiCollocations(docs, "text", 1L, 100)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getInt(4))).toMap
    assert(ranked(("york", "new")) > 0)
  }

  test("minCount drops rare bigrams; k truncates the global ranking") {
    val out = TextAnalysis.pmiCollocations(docs, "text", minCount = 2L, k = 10).collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSet == Set("new" -> "york"))
    val one = TextAnalysis.pmiCollocations(docs, "text", minCount = 1L, k = 1).collect()
    assert(one.length == 1 && one.head.getInt(4) == 1)
  }

  test("plan: TakeOrdered global top-k, pair formation is scan-level") {
    val p = TextAnalysis.pmiCollocations(docs, "text", 1L, 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
    // pairs come from an index explode, never a positional self-join
    assert(!p.contains("SortMergeJoin"), p)
  }
}
