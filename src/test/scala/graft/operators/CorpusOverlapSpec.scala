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

  test("corpusOverlapMatrix: each pair cell == the pairwise corpusOverlap") {
    val m = Dedup.corpusOverlapMatrix(docs, "source", "text",
        shingleN = 3, sketchK = 256)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val sources = docs.select("source").distinct()
      .collect().map(_.getString(0)).sorted
    assert(m.keySet == sources.combinations(2).map(p => (p(0), p(1))).toSet)
    for (Array(sa, sb) <- sources.combinations(2)) {
      val pw = Dedup.corpusOverlap(
        docs.filter(col("source") === sa),
        docs.filter(col("source") === sb), "text",
        shingleN = 3, sketchK = 256).head()
      assert(m((sa, sb)) == ((pw.getLong(0), pw.getLong(1), pw.getDouble(2))),
        s"pair ($sa, $sb)")
    }
  }

  test("corpusOverlapMatrix is exact when corpora fit the sketch; " +
    "identical corpora read 1.0") {
    // tiny slices (< k distinct shingles each): the estimate IS the
    // exact Jaccard of the shingle sets
    val tiny = docs.limit(12)
      .withColumn("source", concat(lit("c"), col("doc_id") % 2))
    val m = Dedup.corpusOverlapMatrix(tiny, "source", "text",
      shingleN = 3, sketchK = 1 << 20).head()
    val sets = tiny.select(col("source"),
        explode(TextAnalysis.wordShingles(col("text"), 3)).as("s"))
      .collect().groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getString(1)).toSet }
    val inter = (sets("c0") & sets("c1")).size.toDouble
    val uni = (sets("c0") | sets("c1")).size.toDouble
    assert(m.getDouble(4) ==
      math.rint(inter / uni * 1e6) / 1e6, s"matrix $m vs ${inter / uni}")
    // duplicated corpus: overlap 1.0 on the diagonal pair
    val dup = docs.limit(12).withColumn("source", lit("x"))
      .unionByName(docs.limit(12).withColumn("source", lit("y")))
    val d = Dedup.corpusOverlapMatrix(dup, "source", "text", 3, 256).head()
    assert(d.getDouble(4) == 1.0 && d.getLong(2) == d.getLong(3))
  }

  test("kmvMerge(sketch(A), sketch(B)) == sketch(A union B) — incremental " +
    "merge never re-scans history") {
    val hashed = shingleRows
      .select(TextAnalysis.hash60(col("s")).as("h"),
        (col("s").substr(1, 1) === lit("t")).as("inA"))
    val k = 128
    def sketchOf(df: org.apache.spark.sql.DataFrame) =
      df.agg(call_function("graft_kmv_sketch", col("h"), lit(k)).as("sk"))
    val sa = sketchOf(hashed.filter(col("inA"))).head().getSeq[Long](0)
    val sb = sketchOf(hashed.filter(!col("inA"))).head().getSeq[Long](0)
    val sUnion = sketchOf(hashed).head().getSeq[Long](0)
    val spark2 = spark
    import spark2.implicits._
    val merged = Seq((sa, sb)).toDF("a", "b")
      .select(Dedup.kmvMerge(col("a"), col("b"), k).as("m"),
        Dedup.kmvEstimate(Dedup.kmvMerge(col("a"), col("b"), k), k).as("est"))
      .head()
    assert(merged.getSeq[Long](0) == sUnion)
    // and the estimate off the merged sketch == distinctCount's estimate
    val direct = Dedup.distinctCount(shingleRows, col("s"), k).head().getDouble(2)
    assert(math.rint(merged.getDouble(1) * 1000) / 1000 == direct)
  }
}
