package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[BucketedStore]]: the persisted co-location contract — joins and
  * aggregates on the bucket key run with ZERO shuffle exchanges, and
  * the layout round-trips values exactly. */
class BucketedStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("join + groupBy on the bucket key: zero Exchange hashpartitioning") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "lang", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_bkt").toString
    BucketedStore.writeBucketed(docs, "graft_bkt_a", s"$dir/a", 8, "doc_id")
    BucketedStore.writeBucketed(
      docs.select(col("doc_id"), (col("n_chars") * 2).as("x")),
      "graft_bkt_b", s"$dir/b", 8, "doc_id")
    try {
      // hint("merge") keeps the small fixture off the broadcast path so
      // the co-located sort-merge shape (the 100 TB regime) is what's
      // asserted
      val j = spark.table("graft_bkt_a").hint("merge")
        .join(spark.table("graft_bkt_b"), "doc_id")
      val jp = j.queryExecution.executedPlan.toString
      assert(!jp.contains("Exchange hashpartitioning"), jp)
      assert(jp.contains("SortMergeJoin"), jp)
      assert(j.count() == docs.count())
      // values survive the layout exactly
      assert(j.select("doc_id", "lang", "n_chars")
        .exceptAll(docs).isEmpty)
      val a = spark.table("graft_bkt_a").groupBy("doc_id")
        .agg(sum("n_chars").as("s"))
      assert(!a.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }
}
