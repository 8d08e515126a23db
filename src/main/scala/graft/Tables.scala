package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  * Plain `spark.read.parquet` so Catalyst gets column pruning and filter
  * pushdown straight into the parquet scan.
  *
  * `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader only
  * accepts as a raw long (`spark.sql.legacy.parquet.nanosAsLong`, set in
  * [[GraftSession]]); we convert to a microsecond TimestampType column
  * here so downstream operators see a real timestamp.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // integer `div`, not `/`: double division rounds the microsecond up
    // for half the rows, off-by-one vs an engine that floors
    if (name == "events")
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
