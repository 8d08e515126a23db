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

  test("bloomFilterCols: a point probe can skip every row group but the " +
    "holder; without bloom filters nothing is skippable") {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sessionState.newHadoopConf()
    // (file, rowGroup) -> does the bloom filter REJECT this doc_id?
    // null bloom filter = not skippable (the no-bloom baseline)
    def probe(root: String, id: Long): Seq[Option[Boolean]] =
      for {
        leaf <- leafDirs(root)
        f <- parquetFiles(leaf)
        reader = ParquetFileReader.open(
          HadoopInputFile.fromPath(new Path(f.toString), conf))
        res <- try {
          reader.getRowGroups.asScala.toSeq.map { rg =>
            val cc = rg.getColumns.asScala
              .find(_.getPath.toDotString == "doc_id").get
            val bf = reader.getBloomFilterDataReader(rg).readBloomFilter(cc)
            if (bf == null) None else Some(!bf.findHash(bf.hash(id)))
          }
        } finally reader.close()
      } yield res
    val planted = docs.select(min("doc_id")).head().getLong(0)
    // 4 files per lang so the probe has groups to skip
    val withBloom = Files.createTempDirectory("graft_sink").toString
    CorpusSink.writeCurated(docs, withBloom,
      partitionCols = Seq("lang"), saltCol = "doc_id",
      filesPerPartition = 4, bloomFilterCols = Seq("doc_id"),
      bloomFilterNdv = 10000)
    val verdicts = probe(withBloom, planted)
    assert(verdicts.size >= 4, s"expected >= 4 row groups, got ${verdicts.size}")
    assert(verdicts.forall(_.isDefined), "bloom filter missing from a group")
    val skipped = verdicts.count(_.contains(true))
    // every group NOT holding the planted id is skippable; at least one
    // group must hold it (no false negatives allowed by the structure)
    assert(skipped >= verdicts.size - 2 && skipped < verdicts.size,
      s"$skipped of ${verdicts.size} groups skippable")
    // read-back correctness through the bloom-filtered files
    assert(spark.read.parquet(withBloom)
      .filter(col("doc_id") === planted).count() == 1)
    // baseline: same layout without bloom -> zero skippable groups
    val noBloom = Files.createTempDirectory("graft_sink").toString
    CorpusSink.writeCurated(docs, noBloom,
      partitionCols = Seq("lang"), saltCol = "doc_id",
      filesPerPartition = 4)
    assert(probe(noBloom, planted).forall(_.isEmpty),
      "baseline unexpectedly carries bloom filters")
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
