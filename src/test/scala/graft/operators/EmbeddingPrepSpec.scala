package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Embedding preprocessing ([[Similarity.l2Norm]]/[[Similarity.l2Normalize]]/
  * [[Similarity.truncateRenormalize]]/[[Similarity.meanPoolVectors]]):
  * plain-Scala mirrors, unit-norm and zero-vector contracts, Matryoshka
  * composition, pooled-mean exactness. */
class EmbeddingPrepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val emb =
    graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")

  test("l2Norm == plain-Scala sequential fold; normalized vectors are unit") {
    val rows = emb.limit(50).select(col("vec_id"), col("embedding"),
        Similarity.l2Norm(col("embedding")).as("n"),
        Similarity.l2Norm(Similarity.l2Normalize(col("embedding"))).as("un"))
      .collect()
    for (r <- rows) {
      val v = r.getSeq[Float](1)
      val ref = math.sqrt(v.foldLeft(0.0)((a, x) =>
        a + x.toDouble * x.toDouble))
      assert(r.getDouble(2) == ref, s"vec ${r.getLong(0)}")
      // components are downcast to float after the divide, so the
      // re-measured norm carries float rounding, not double
      assert(math.abs(r.getDouble(3) - 1.0) < 1e-6)
    }
  }

  test("zero vectors pass through unchanged; cosine is normalize-invariant") {
    val spark2 = spark
    import spark2.implicits._
    val z = Seq((1L, Seq.fill(8)(0.0f)), (2L, Seq(3.0f, 4.0f, 0f, 0f, 0f, 0f, 0f, 0f)))
      .toDF("id", "v")
    val out = z.select(col("id"), Similarity.l2Normalize(col("v")).as("u"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(out(1L).forall(_ == 0.0f))
    assert(math.abs(out(2L).head - 0.6f) < 1e-6)
    val df = emb.filter(col("vec_id") === 0).select(col("embedding").as("a"))
      .crossJoin(emb.filter(col("vec_id") === 1).select(col("embedding").as("b")))
    val Array(raw, normed) = df.select(
        graft.functions.cosine(col("a"), col("b")),
        graft.functions.cosine(Similarity.l2Normalize(col("a")),
          Similarity.l2Normalize(col("b"))))
      .head().toSeq.map(_.asInstanceOf[Double]).toArray
    assert(math.abs(raw - normed) < 1e-9)
  }

  test("truncateRenormalize: dim components, unit norm, full-dim == plain " +
    "normalize") {
    val r = emb.limit(20).select(
        Similarity.truncateRenormalize(col("embedding"), 16).as("m16"),
        Similarity.truncateRenormalize(col("embedding"), 64).as("m64"),
        Similarity.l2Normalize(col("embedding")).as("u"))
      .collect()
    for (row <- r) {
      assert(row.getSeq[Float](0).size == 16)
      assert(row.getSeq[Float](1) == row.getSeq[Float](2))
      val m = row.getSeq[Float](0)
      val n = math.sqrt(m.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
      assert(math.abs(n - 1.0) < 1e-6)
    }
  }

  test("meanPoolVectors == centroidComponents reassembled == plain-Scala " +
    "micro-exact mean") {
    val pooled = Similarity.meanPoolVectors(emb, "label", "embedding")
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
    val comps = Similarity.centroidComponents(emb, "label", "embedding")
      .collect().groupBy(_.getInt(0))
      .map { case (l, rs) =>
        l -> rs.sortBy(_.getInt(1)).map(_.getDouble(2).toFloat).toSeq
      }
    assert(pooled == comps)
    // plain-Scala mirror for one label
    val l0 = emb.filter(col("label") === pooled.keySet.min)
      .select("embedding").collect().map(_.getSeq[Float](0))
    val dims = l0.head.indices
    val ref = dims.map { d =>
      val micro = l0.map(v => BigDecimal(v(d).toDouble * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).sum
      (BigDecimal(micro.toDouble / l0.length)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong / 1e6).toFloat
    }
    assert(pooled(pooled.keySet.min) == ref)
  }
}
