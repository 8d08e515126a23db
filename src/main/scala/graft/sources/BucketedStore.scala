package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table storage — the persisted co-location layout that makes
  * repeated joins/aggregates on a key SHUFFLE-FREE.
  *
  * At 100 TB the dominant cost of an id-keyed join is the exchange of
  * the big side. Spark's native bucketing pays that exchange ONCE at
  * write: rows are hash-partitioned into a fixed number of bucket files
  * (and sorted within each), and the catalog records the layout. Every
  * later equi-join between two tables bucketed on the same key with the
  * same bucket count — and every groupBy on the key — satisfies its
  * required distribution straight from the scan: zero `Exchange
  * hashpartitioning` nodes (pinned in BucketedStoreSpec). This is the
  * storage companion to the engine's incremental indexes
  * ([[graft.operators.Similarity.IvfIndex]], the near-dup band index):
  * write the corpus bucketed by document id, and each incremental batch
  * joins against history without re-shuffling history.
  *
  * The bucket count is a LAYOUT CONTRACT: both sides of a co-located
  * join must agree on it, and it bounds read parallelism — pick
  * ~(total size / target partition size) at write time.
  */
object BucketedStore {

  /** Write `df` as a bucketed, per-bucket-sorted external parquet table
    * registered as `table` at `path`. Overwrites both. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    buckets: Int, key: String): Unit = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .saveAsTable(table)
  }
}
