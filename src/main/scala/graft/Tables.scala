package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  * Plain `spark.read.parquet` so Catalyst gets column pruning and filter
  * pushdown straight into the parquet scan.
  *
  * `events.ts` has shipped as parquet TIMESTAMP(NANOS) — which Spark's
  * reader only accepts as a raw long (`spark.sql.legacy.parquet
  * .nanosAsLong`, set in [[GraftSession]]) — and, in newer generations,
  * as TIMESTAMP(MICROS) (surfacing as TIMESTAMP_NTZ). Normalize both to
  * a microsecond TimestampType column so downstream operators always see
  * the same type regardless of which testdata vintage is on disk.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** True when `tz` names wall-clock UTC under any spelling ("UTC",
    * "Etc/UTC", "GMT", "Z", "+00:00", ...): a fixed zero offset. The NTZ
    * -> timestamp cast is identity exactly for these zones. */
  private[graft] def isUtcEquivalent(tz: String): Boolean =
    try {
      val rules = java.time.ZoneId.of(tz).getRules
      rules.isFixedOffset &&
        rules.getOffset(java.time.Instant.EPOCH) == java.time.ZoneOffset.UTC
    } catch { case _: java.time.DateTimeException => false }

  /** Fail loudly when the session timezone would make an NTZ cast shift
    * wall-clock values (shared by the batch and streaming events readers). */
  private[graft] def requireUtcSession(spark: SparkSession): Unit = {
    val tz = spark.conf.get("spark.sql.session.timeZone")
    require(isUtcEquivalent(tz),
      s"events.ts is TIMESTAMP_NTZ; casting needs a UTC-equivalent spark.sql.session.timeZone (got $tz)")
  }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") {
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      df.schema("ts").dataType match {
        // nanos-as-long vintage: integer `div`, not `/` — double division
        // rounds the microsecond up for half the rows, off-by-one vs an
        // engine that floors
        case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        // micros vintage: NTZ -> session-TZ timestamp. The wall-clock ->
        // instant mapping is only identity under UTC; fail loudly instead
        // of silently shifting for a caller whose session isn't pinned.
        case TimestampNTZType =>
          requireUtcSession(spark)
          df.withColumn("ts", col("ts").cast("timestamp"))
        case TimestampType => df
        case other => throw new IllegalStateException(
          s"events.ts: unsupported parquet type $other (expected long/TIMESTAMP_NTZ/TIMESTAMP)")
      }
    } else df
  }
}
