package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.functions.dsum

/** Structured Streaming variants of the event-time operators
  * (graft.operators.EventWindows is the batch ground truth): file-source
  * readStream -> watermarked windowed aggregation -> sink. The same
  * DataFrame transformations run in both modes; after the stream drains
  * (Trigger.AvailableNow) and the watermark closes, results converge to
  * the batch answer — asserted by StreamingSpec.
  */
object Streams {

  /** events.parquet schema as stored (ts = TIMESTAMP(NANOS), read as
    * long via the nanosAsLong flag, then converted). */
  private val rawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source streaming read of an events directory/file. */
  def readEvents(spark: SparkSession, path: String): DataFrame =
    spark.readStream
      .schema(rawSchema)
      .parquet(path)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Tumbling event-time window aggregate with a watermark: late events
    * beyond `lateness` are dropped, state for closed windows is evicted —
    * the unbounded-stream-safe form of EventWindows.tumbling. */
  def tumbling(events: DataFrame, width: String, lateness: String,
               keys: Seq[String]): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), width) +: keys.map(col): _*)
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start") +:
        keys.map(col) :+ col("n_events") :+ col("sum_value"): _*)

  /** Native session windows (gap-based), streaming form of
    * EventWindows.sessions: state merges as events arrive, sessions emit
    * once the watermark passes their close. */
  def sessions(events: DataFrame, gap: String, lateness: String,
               keyCol: String): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col(keyCol), col("n_events"), col("sum_value"))

  /** Drain a bounded stream into an in-memory table and return it.
    * Complete mode: every window in the result (test-scale). */
  def drainToMemory(spark: SparkSession, df: DataFrame, name: String,
                    complete: Boolean = true): DataFrame = {
    val q: StreamingQuery = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(if (complete) "complete" else "append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
