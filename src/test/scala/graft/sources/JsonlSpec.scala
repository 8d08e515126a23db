package graft.sources

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[Jsonl]]: gzip JSONL boundary format — byte-faithful round trip
  * (newlines, quotes, unicode, nulls), bounded shard counts, and the
  * fixture marker cache. */
class JsonlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("round trip preserves every row including hostile strings and nulls") {
    val spark2 = spark
    import spark2.implicits._
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val hostile = Seq(
      (900001L, "line one\nline two\ttabbed", Some("en"), "s\"quoted\"", 10L),
      (900002L, "unicode: é中文 😀", None, "u", 5L),
      (900003L, "", Some("xx"), "empty", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val df = docs.unionByName(hostile)
    val out = Files.createTempDirectory("graft_jsonl").toString
    Jsonl.writeJsonl(df, out, files = 3, saltCol = "doc_id")
    val back = Jsonl.readJsonl(spark, out, df.schema)
    assert(back.count() == df.count())
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
    // bounded by `files` gzip shards regardless of upstream partitioning
    // (an upper bound: salt groups can hash-merge, never split)
    val shards = Files.list(Paths.get(out)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".gz")).toSeq
    assert(shards.size >= 1 && shards.size <= 3,
      shards.map(_.getFileName).mkString(","))
  }

  test("shard count is bounded even from many upstream tasks") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .repartition(16)
    val out = Files.createTempDirectory("graft_jsonl2").toString
    Jsonl.writeJsonl(docs, out, files = 2, saltCol = "doc_id")
    val shards = Files.list(Paths.get(out)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".gz")).toSeq
    assert(shards.size >= 1 && shards.size <= 2)
  }

  test("docs fixture is marker-cached and reads back the parquet rows") {
    val p1 = Jsonl.ensureDocsFixture(spark, "/root/testdata/sf0.001")
    val mtime = Files.getLastModifiedTime(Paths.get(p1, ".complete"))
    val p2 = Jsonl.ensureDocsFixture(spark, "/root/testdata/sf0.001")
    assert(p1 == p2)
    assert(Files.getLastModifiedTime(Paths.get(p2, ".complete")) == mtime)
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val back = Jsonl.readJsonl(spark, p1, docs.schema)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }
}
