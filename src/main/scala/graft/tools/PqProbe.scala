package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** One-off PQ recall probe across (m, ksub, iters) configurations —
  * documents how the recall/compression trade moves on the synthetic
  * (clusterless, worst-case-for-PQ) embeddings fixture. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val q = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceL2TopK(q, emb, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((m, ksub, iters) <- Seq((4, 16, 0), (4, 16, 2), (8, 16, 2),
        (8, 32, 2), (16, 16, 2), (16, 32, 2), (8, 64, 2), (16, 64, 2))) {
      val cb = Similarity.pqTrain(emb, "vec_id", "embedding", 64, m, ksub, iters)
      val codes = Similarity.pqCodes(emb, "vec_id", "embedding", cb)
      val adc = Similarity.pqAdcTopK(q, codes, "vec_id", "embedding", cb, 10)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"m=$m%d ksub=$ksub%d iters=$iters%d recall=${(adc & exact).size.toDouble / exact.size}%.3f")
    }
    spark.stop()
  }
}
