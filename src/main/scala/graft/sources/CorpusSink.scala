package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Curated-corpus parquet writer — the OUTPUT side of the curation
  * pipeline, sized for the cluster that reads it back.
  *
  * At 100 TB the write layout decides the read path's fate, and the
  * naive `df.write.partitionBy(...)` fails in two standard ways:
  *
  *  - **small-files explosion**: every upstream task holding rows for
  *    every partition value writes its own file per value — a 2000-task
  *    curation output over 3 splits × 40 langs becomes 240 000 files,
  *    and the downstream driver chokes on listing before reading a row.
  *  - **monster files**: one hot partition (split=train, lang=en is
  *    most of any web corpus) collapsed to one task writes one
  *    multi-GB file that a single reader must scan alone.
  *
  * This writer pins both ends deterministically: rows are first
  * repartitioned ON the partition columns plus a `filesPerPartition`-way
  * salt over `saltCol` (each (partition-values, salt) group lands on
  * exactly one task → at most `filesPerPartition` files per leaf
  * directory, regardless of upstream task count), and
  * `maxRecordsPerFile` re-splits any file that still grows past the cap
  * (the hot-partition bound — Spark rolls the file at the cap without
  * another shuffle). `sortCols` orders rows WITHIN each file
  * (`sortWithinPartitions`) so parquet row-group min/max statistics
  * actually prune — a corpus sorted by quality score serves
  * "top-decile only" reads from a fraction of the row groups.
  *
  * The salt is md5-free deterministic (`xxhash64(saltCol)`), so reruns
  * produce byte-stable layouts. Readers need nothing special:
  * `spark.read.parquet(path)` with a filter on the partition columns
  * prunes directories at planning time (PartitionFilters in the scan —
  * spec-pinned). */
object CorpusSink {
  /** `bloomFilterCols` (round 11): parquet native bloom filters on
    * high-cardinality point-lookup keys (doc_id, url) — the read-side
    * complement to the sort-driven min/max pruning. Z-order/sort
    * statistics prune RANGE predicates; a point probe on a key the file
    * is NOT sorted by still scans every row group whose min/max
    * straddles the value, and on a high-cardinality key that is ALL of
    * them. A bloom filter answers "definitely not in this row group"
    * per group at a few bits/value, so `WHERE doc_id = x` skips every
    * group but the one holding x (CorpusSinkSpec measures it).
    * `bloomFilterNdv` sizes the filter (expected distinct values PER
    * ROW GROUP — over-sizing costs footer bytes, under-sizing costs
    * false positives = unskipped groups). */
  def writeCurated(df: DataFrame, path: String,
                   partitionCols: Seq[String], saltCol: String,
                   filesPerPartition: Int = 1,
                   sortCols: Seq[String] = Nil,
                   maxRecordsPerFile: Long = 1L << 20,
                   bloomFilterCols: Seq[String] = Nil,
                   bloomFilterNdv: Long = 1L << 20): Unit = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    require(filesPerPartition >= 1,
      s"filesPerPartition must be >= 1 (got $filesPerPartition)")
    require(maxRecordsPerFile >= 1,
      s"maxRecordsPerFile must be >= 1 (got $maxRecordsPerFile)")
    require(bloomFilterNdv >= 1,
      s"bloomFilterNdv must be >= 1 (got $bloomFilterNdv)")
    val salted = df.withColumn("__fsalt",
      pmod(xxhash64(col(saltCol)), lit(filesPerPartition.toLong)))
    val placed = salted
      .repartition((partitionCols :+ "__fsalt").map(col): _*)
    val ordered =
      if (sortCols.isEmpty) placed
      // partition cols first (the writer splits files on them; a sort
      // already prefixed by them also satisfies dynamic-partitioning's
      // required ordering, so Spark injects no second sort), then the
      // caller's order. The salt is deliberately NOT in the sort: it
      // only PLACES rows on tasks — two salt groups of one partition
      // value that hash-collide onto the same task merge into one file,
      // and that file must still read as one sorted run, not salt-major
      // runs
      else placed.sortWithinPartitions(
        (partitionCols ++ sortCols).map(col): _*)
    val writer = ordered.drop("__fsalt")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
    val withBloom = bloomFilterCols.foldLeft(writer) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", bloomFilterNdv)
    }
    withBloom
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }
}
