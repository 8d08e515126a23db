package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Lloyd's k-means trainer: seed contract at iters=0, exact q40-mean
  * arithmetic, tie-break + empty-cell carry-forward, convergence to a
  * fixpoint on separable data, and the trained index staying exact
  * under probe-all IVF. */
class KmeansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb =
    graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")

  private def centroidMap(seeds: Seq[(Long, Seq[Float])]): Map[Long, Seq[Float]] =
    seeds.toMap

  test("iters = 0 returns exactly the md5 seed table (the q49/q72 contract)") {
    val trained = Similarity.kmeansTrain(emb, "vec_id", "embedding", nlist = 4, iters = 0)
    assert(trained.size == 4)
    // each seed centroid must be the verbatim embedding of its cell id
    val byId = emb.filter(col("vec_id").isin(trained.map(_._1): _*))
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    for ((cell, cen) <- trained) assert(cen == byId(cell), s"cell $cell")
    // and the frame view reports n_vecs = 0 everywhere (nothing assigned)
    val frame = Similarity.kmeansCentroids(emb, "vec_id", "embedding", 4, 0)
    assert(frame.filter(col("n_vecs") =!= 0).count() == 0)
    assert(frame.count() == 4L * 64)
  }

  test("k = 1 after one iteration is the global q40 micro-quantized mean") {
    val trained = Similarity.kmeansTrain(emb, "vec_id", "embedding", nlist = 1, iters = 1)
    assert(trained.size == 1)
    val expected = Similarity
      .centroidComponents(emb.withColumn("one", lit(1)), "one", "embedding")
      .orderBy("dim").collect().map(_.getDouble(2).toFloat).toSeq
    assert(trained.head._2 == expected)
  }

  test("identical vectors: ties go to the smaller cell, the other cell carries forward with n_vecs = 0") {
    val v = Seq.fill(64)(0.5f)
    val df = (0L until 10L).map(i => (i, v)).toDF("vec_id", "embedding")
    val frame = Similarity.kmeansCentroids(df, "vec_id", "embedding", nlist = 2, iters = 2)
      .collect()
    val counts = frame.map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(counts.size == 2)
    // every vector has identical cosine to both (identical) centroids ->
    // tie-break sends all 10 to the smaller cell id
    assert(counts(counts.keys.min) == 10)
    assert(counts(counts.keys.max) == 0)
    // both centroids remain the (rounded) common vector
    frame.foreach(r => assert(math.abs(r.getDouble(2) - 0.5) < 1e-6))
  }

  test("separable clusters: converged by iter 2 (fixpoint) and centroids sit on the cluster means") {
    // two tight orthogonal clusters in 4-dim; ids interleaved so md5
    // seed order is irrelevant to the outcome once converged
    def vec(axis: Int, jitter: Float): Seq[Float] = {
      val base = Array.fill(4)(0.0f)
      base(axis) = 1.0f
      base((axis + 2) % 4) = jitter
      base.toSeq
    }
    val rows = (0 until 16).map { i =>
      (i.toLong, vec(i % 2, 0.01f * (i / 2)))
    }
    val df = rows.toDF("vec_id", "embedding")
    val t2 = Similarity.kmeansTrain(df, "vec_id", "embedding", nlist = 2, iters = 2)
    val t4 = Similarity.kmeansTrain(df, "vec_id", "embedding", nlist = 2, iters = 4)
    assert(centroidMap(t2) == centroidMap(t4), "not converged by iter 2")
    // each trained centroid points along exactly one cluster axis
    val axes = t2.map(_._2).map(c => c.zipWithIndex.maxBy(_._1)._2).toSet
    assert(axes == Set(0, 1), s"centroids collapsed onto one cluster: $t2")
  }

  test("ivfBuildWith(trained) probe-all == brute force (exactness survives training)") {
    val queries = emb.filter(col("vec_id") < 8)
    val trained = Similarity.kmeansTrain(emb, "vec_id", "embedding", nlist = 4, iters = 2)
    val idx = Similarity.ivfBuildWith(emb, "vec_id", "embedding", trained)
    val ivf = Similarity.ivfProbe(idx, queries, "vec_id", "embedding", k = 5, nprobe = 4)
    val bf = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", k = 5)
    val a = ivf.select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet
    val b = bf.select("query_id", "neighbor_id", "rank").collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("cluster populations sum to the corpus on every iteration's report") {
    val n = emb.count()
    val frame = Similarity.kmeansCentroids(emb, "vec_id", "embedding", nlist = 4, iters = 2)
    val total = frame.filter(col("dim") === 0).agg(sum("n_vecs")).head().getLong(0)
    assert(total == n)
  }
}
