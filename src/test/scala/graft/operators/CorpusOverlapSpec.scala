package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[Dedup.corpusOverlap]]: KMV estimator contracts — exactness below
  * the sketch size, identical/disjoint extremes, the ±1/√k error bound
  * on real data, and the TakeOrdered sketch plan. */
class CorpusOverlapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs =
    graft.Tables(spark, "/root/testdata/sf0.001", "documents")

  test("identical corpora estimate 1.0; disjoint corpora 0.0") {
    val a = docs.limit(20)
    val same = Dedup.corpusOverlap(a, a, "text").head()
    assert(same.getDouble(2) == 1.0)
    assert(same.getLong(0) == same.getLong(1))
    // token-disjoint second corpus: suffix every token
    val b = a.withColumn("text",
      array_join(transform(split(trim(col("text")), "\\s+"),
        t => concat(t, lit("_z"))), " "))
    val dis = Dedup.corpusOverlap(a, b, "text").head()
    assert(dis.getDouble(2) == 0.0 && dis.getLong(1) == 0L)
  }

  test("below sketchK the estimate IS the exact Jaccard") {
    val a = docs.filter(col("doc_id") % 2 === 0).limit(3)
    val b = docs.filter(col("doc_id") % 2 === 1).limit(3)
    // huge sketch: nothing truncated, so est = exact by construction
    val est = Dedup.corpusOverlap(a, b, "text", sketchK = 1 << 20)
      .head().getDouble(2)
    val ha = a.select(explode(call_function("graft_md5_hash_array",
      TextAnalysis.wordShingles(col("text"), 3), lit(15))).as("h")).distinct()
    val hb = b.select(explode(call_function("graft_md5_hash_array",
      TextAnalysis.wordShingles(col("text"), 3), lit(15))).as("h")).distinct()
    val inter = ha.join(hb, Seq("h"), "left_semi").count().toDouble
    val union = ha.union(hb).distinct().count().toDouble
    assert(math.abs(est - BigDecimal(inter / union)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("sketched estimate lands within 2/sqrt(k) of exact (sf0.001 halves)") {
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    val est = Dedup.corpusOverlap(a, b, "text", sketchK = 256).head().getDouble(2)
    val exact = Dedup.corpusOverlap(a, b, "text", sketchK = 1 << 20).head().getDouble(2)
    assert(math.abs(est - exact) <= 2.0 / math.sqrt(256), s"est=$est exact=$exact")
  }

  test("plan: sketches are TakeOrdered, never a corpus-by-corpus join") {
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    val p = Dedup.corpusOverlap(a, b, "text")
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  private def shingleRows =
    docs.select(explode(TextAnalysis.wordShingles(col("text"), 3)).as("s"))

  test("distinctCount: exact below sketchK, estimate within 2/sqrt(k) above") {
    val tokens = docs
      .select(explode(split(trim(col("text")), "\\s+")).as("t"))
      .filter(col("t") =!= "")
    val exactVocab = tokens.select("t").distinct().count().toDouble
    val small = Dedup.distinctCount(tokens, col("t"), sketchK = 100000).head()
    assert(small.getDouble(2) == exactVocab) // vocab << k: exact path
    val exact = shingleRows.select("s").distinct().count().toDouble
    val est = Dedup.distinctCount(shingleRows, col("s"), sketchK = 1024)
      .head().getDouble(2)
    assert(math.abs(est - exact) / exact <= 2.0 / math.sqrt(1024),
      s"est=$est exact=$exact")
  }

  test("distinctCount: partition-invariant (the bounded prefilter never " +
    "changes the global bottom-k)") {
    val one = Dedup.distinctCount(shingleRows.repartition(1), col("s"), 256).head()
    val many = Dedup.distinctCount(shingleRows.repartition(13), col("s"), 256).head()
    assert(one == many)
  }
}
