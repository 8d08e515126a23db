package graft.sources

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Curated-corpus writer: bounded files per leaf partition, hot-file
  * re-splitting at the record cap, byte-faithful round trip, in-file
  * ordering, and planning-time partition pruning on read-back. */
class CorpusSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val docs =
    graft.Tables(spark, TestSpark.sfDir, "documents")
      .select("doc_id", "lang", "source", "text")

  private def leafDirs(root: String): Seq[java.nio.file.Path] =
    Files.walk(Paths.get(root)).iterator().asScala
      .filter(p => Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("lang="))
      .toSeq

  private def parquetFiles(dir: java.nio.file.Path): Seq[java.nio.file.Path] =
    Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq

  test("files per leaf partition are bounded by filesPerPartition, not by upstream tasks") {
    val out = Files.createTempDirectory("graft_sink").toString
    // 16 upstream tasks x 2 langs would naively write up to 32 files
    // per leaf; the salt bounds it to 2
    CorpusSink.writeCurated(docs.repartition(16), out,
      partitionCols = Seq("lang"), saltCol = "doc_id",
      filesPerPartition = 2)
    val leaves = leafDirs(out)
    assert(leaves.nonEmpty)
    for (leaf <- leaves) {
      val n = parquetFiles(leaf).size
      assert(n >= 1 && n <= 2, s"$leaf has $n files")
    }
    // byte-faithful round trip (partition column comes back as a dir col)
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    val a = docs.select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val b = back.select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(a == b)
  }

  test("maxRecordsPerFile re-splits a hot partition past the cap") {
    val out = Files.createTempDirectory("graft_sink").toString
    CorpusSink.writeCurated(docs, out,
      partitionCols = Seq("lang"), saltCol = "doc_id",
      filesPerPartition = 1, maxRecordsPerFile = 50)
    val rowsPerLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for (leaf <- leafDirs(out)) {
      val lang = leaf.getFileName.toString.stripPrefix("lang=")
      val expected = math.ceil(rowsPerLang(lang) / 50.0).toInt
      val n = parquetFiles(leaf).size
      assert(n == expected, s"$leaf: $n files, expected $expected")
    }
  }

  test("sortCols orders rows inside every output file (row-group pruning layout)") {
    val out = Files.createTempDirectory("graft_sink").toString
    CorpusSink.writeCurated(docs, out,
      partitionCols = Seq("lang"), saltCol = "doc_id",
      filesPerPartition = 2, sortCols = Seq("doc_id"))
    for (leaf <- leafDirs(out); f <- parquetFiles(leaf)) {
      val ids = spark.read.parquet(f.toString)
        .select("doc_id").collect().map(_.getLong(0))
      assert(ids.sameElements(ids.sorted), s"$f not sorted")
    }
  }

  test("read-back with a partition filter prunes at planning time") {
    val out = Files.createTempDirectory("graft_sink").toString
    CorpusSink.writeCurated(docs, out,
      partitionCols = Seq("lang"), saltCol = "doc_id")
    val scan = spark.read.parquet(out).filter(col("lang") === "en")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"), plan)
    // and the pruned count matches the source slice
    assert(scan.count() == docs.filter(col("lang") === "en").count())
  }
}
