package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** SemDeDup's hot-cell skew guard: sub-splitting an oversized cell into
  * pair tiles must never change the answer — only bound the per-task
  * pair space — including on a pathologically clustered corpus where
  * every vector lands in one cell. */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val emb =
    graft.Tables(spark, TestSpark.sfDir, "embeddings")

  private def keeps(df: org.apache.spark.sql.DataFrame): Map[Long, Boolean] =
    df.select("vec_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap

  test("tiled (guarded) result == unguarded result on the fixture") {
    val unguarded = keeps(Dedup.semDedup(emb, "vec_id", "embedding",
      threshold = 0.4, nlist = 8, cellCap = Int.MaxValue))
    // cellCap=2 forces heavy sub-splitting of every cell
    val tiled = keeps(Dedup.semDedup(emb, "vec_id", "embedding",
      threshold = 0.4, nlist = 8, cellCap = 2))
    assert(tiled == unguarded)
    assert(tiled.valuesIterator.contains(false)) // some drops happened
  }

  test("semDedupWith(seed table) == semDedup(nlist) — the trained path shares the whole pipeline") {
    val seeds0 = Similarity.kmeansTrain(emb, "vec_id", "embedding", nlist = 8, iters = 0)
    val viaSeeds = keeps(Dedup.semDedupWith(emb, "vec_id", "embedding",
      threshold = 0.4, seeds = seeds0))
    val viaNlist = keeps(Dedup.semDedup(emb, "vec_id", "embedding",
      threshold = 0.4, nlist = 8))
    assert(viaSeeds == viaNlist)
  }

  test("semDedupWith(trained centroids): keep rule holds cell-by-cell against brute force") {
    val trained = Similarity.kmeansTrain(emb, "vec_id", "embedding", nlist = 8, iters = 2)
    val out = Dedup.semDedupWith(emb, "vec_id", "embedding",
      threshold = 0.4, seeds = trained)
    // brute-force the pair-dominance rule from the operator's OWN cell
    // assignment (in its output): dropped iff a lower-id cell-mate is
    // within threshold
    val joined = out.join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
    val a = joined.select(col("cell"), col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = joined.select(col("cell"), col("vec_id").as("id_b"), col("embedding").as("vb"),
      col("keep").as("keep_b"))
    val dominated = b.join(a, Seq("cell"))
      .filter(col("id_a") < col("id_b") &&
        round(graft.functions.cosine(col("va"), col("vb")), 6) >= 0.4)
      .select(col("id_b").as("vec_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    val km = keeps(out)
    assert(km.nonEmpty)
    for ((id, keep) <- km)
      assert(keep == !dominated.contains(id), s"vec $id keep=$keep")
  }

  test("a fully clustered corpus (every vector in one hot cell) is " +
    "tiled without changing the answer") {
    import spark.implicits._
    // near-identical vectors: nlist=4 still assigns them all to one cell
    val hot = (0L until 64L).map { i =>
      (i, Seq(1.0f, 1.0f, 0.001f * i, 0.5f))
    }.toDF("vec_id", "embedding")
    val unguarded = keeps(Dedup.semDedup(hot, "vec_id", "embedding",
      threshold = 0.9, nlist = 4, cellCap = Int.MaxValue))
    val tiled = keeps(Dedup.semDedup(hot, "vec_id", "embedding",
      threshold = 0.9, nlist = 4, cellCap = 8))
    assert(tiled == unguarded)
    // sanity: the hot cell really is near-degenerate — almost everything
    // is dominated by a lower id at this threshold
    assert(unguarded.count(!_._2) > 48)
  }

  test("the tiled pair stage still reads ONE (cell,tile)-keyed exchange " +
    "from both sides") {
    val df = Dedup.semDedup(emb, "vec_id", "embedding",
      threshold = 0.4, nlist = 8, cellCap = 2)
    // AQE reuses identical exchanges at RUNTIME: execute THIS dataframe's
    // own QueryExecution (count() would build a separate one) so its
    // adaptive plan finalizes before we read it
    df.collect()
    // AQE's toString appends the pre-adaptive "== Initial Plan ==";
    // assert on the executed (final) section only
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("isFinalPlan=true"), p)
    // both pair sides read the same (cell,g1,g2) exchange — the second
    // reference must be a ReusedExchange, not a second shuffle of the
    // replicated rows
    assert("\\+\\- Exchange hashpartitioning\\(cell[^,]*, g1".r
      .findAllIn(p).length == 1, p)
    assert("ReusedExchange [^\n]*hashpartitioning\\(cell[^,]*, g1".r
      .findAllIn(p).nonEmpty, p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
