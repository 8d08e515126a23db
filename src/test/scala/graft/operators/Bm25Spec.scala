package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[TextAnalysis.bm25TopK]]: score contract against a plain-Scala
  * mirror, query-term set semantics, N/avgdl accounting for blank
  * documents, and the broadcast-only query-side plan pin. */
class Bm25Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "spark join join window"),
    (1L, "join filter scan"),
    (2L, "window window window spark"),
    (3L, ""), // blank: counts in N, contributes 0 tokens to avgdl
    (4L, "filter scan scan sort merge")
  ).toDF("doc_id", "text")

  /** Plain-Scala BM25 mirror with the operator's exact arithmetic. */
  private def mirror(corpus: Seq[(Long, String)], qs: Seq[(Int, String)],
                     k1: Double = 1.2, b: Double = 0.75): Map[(Int, Long), Double] = {
    val toks = corpus.map { case (id, t) =>
      id -> t.trim.split("\\s+").filter(_.nonEmpty).toSeq
    }.toMap
    val n = corpus.size.toLong
    val avgdl = toks.valuesIterator.map(_.size).sum.toDouble / n
    val dfOf = toks.values.flatMap(_.distinct).groupBy(identity).map { case (t, o) => t -> o.size }
    (for {
      (qid, qtext) <- qs
      terms = qtext.trim.split("\\s+").filter(_.nonEmpty).distinct
      (docId, dts) <- toks
      contribs = terms.flatMap { t =>
        val tf = dts.count(_ == t)
        if (tf == 0) None else {
          val df = dfOf(t).toDouble
          val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
          Some(idf * tf * (k1 + 1.0) / (tf + k1 * ((1.0 - b) + b * dts.size / avgdl)))
        }
      }
      if contribs.nonEmpty
    } yield (qid, docId) ->
      BigDecimal(contribs.sum).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
  }

  private def run(qs: Seq[(Int, String)], k: Int = 10): Map[(Int, Long), Double] =
    TextAnalysis.bm25TopK(docs, "doc_id", "text", qs, k)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("scores match the plain-Scala BM25 mirror (blank doc in N/avgdl)") {
    val qs = Seq(1 -> "spark window", 2 -> "scan merge")
    val got = run(qs)
    val want = mirror(docs.collect().map(r => r.getLong(0) -> r.getString(1)).toSeq, qs)
    assert(got.keySet == want.keySet)
    for ((key, w) <- want) assert(math.abs(got(key) - w) < 1e-9, s"$key: ${got(key)} vs $w")
  }

  test("duplicate query terms count once") {
    assert(run(Seq(1 -> "join join join")) == run(Seq(1 -> "join")))
  }

  test("only documents sharing >= 1 query term are returned, ranked desc") {
    val out = TextAnalysis.bm25TopK(docs, "doc_id", "text", Seq(7 -> "spark"), k = 10)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(1)).toSet == Set(0L, 2L)) // only docs with "spark"
    assert(out.map(_.getInt(3)).toSeq == Seq(1, 2))
    assert(out.head.getDouble(2) >= out.last.getDouble(2))
  }

  test("k truncates per query; ties break to the smaller doc_id") {
    val tied = Seq((10L, "alpha beta"), (11L, "alpha beta"), (12L, "alpha beta"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(tied, "doc_id", "text", Seq(1 -> "alpha"), k = 2)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(10L, 11L))
  }

  test("plan: query-side joins broadcast, corpus never query-shuffled") {
    val p = TextAnalysis.bm25TopK(docs, "doc_id", "text",
      Seq(1 -> "spark window join"), k = 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // corpus-keyed exchanges only — (doc,term) tf (scoring + pruned df
    // branch), query-term distinct (x2), term df, (query,doc) score agg,
    // query_id window — bounded and query-set independent
    val nEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(nEx <= 8, s"$nEx exchanges:\n$p")
  }
}
