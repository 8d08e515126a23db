package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.dsum

/** Event-time window aggregations, batch form. The same transformations
  * run under Structured Streaming (see [[graft.streaming.Streams]]) — the
  * batch results here are the exactly-once ground truth the streaming
  * variants converge to after the watermark closes.
  */
object EventWindows {

  /** Tumbling window aggregate: (window_start, keys...) -> agg. Uses the
    * native `window()` bucketing, which Catalyst turns into arithmetic on
    * the timestamp — no shuffle beyond the final groupBy. */
  def tumbling(events: DataFrame, tsCol: String, width: String,
               keys: Seq[String], valueCol: String): DataFrame =
    events.groupBy(window(col(tsCol), width) +: keys.map(col): _*)
      .agg(count(lit(1)).as("n_events"), dsum(col(valueCol)).as("sum_value"))
      .select(col("window.start").as("window_start") +:
        keys.map(col) :+ col("n_events") :+ col("sum_value"): _*)

  /** Sliding window aggregate (width, slide). Each event lands in
    * width/slide buckets — Spark expands via the same native generator. */
  def sliding(events: DataFrame, tsCol: String, width: String, slide: String,
              keys: Seq[String], valueCol: String): DataFrame =
    events.groupBy(window(col(tsCol), width, slide) +: keys.map(col): _*)
      .agg(count(lit(1)).as("n_events"), dsum(col(valueCol)).as("sum_value"))
      .select(col("window.start").as("window_start") +:
        keys.map(col) :+ col("n_events") :+ col("sum_value"): _*)

  /** Gap-based session assignment: classic gaps-and-islands. A new session
    * starts when the gap to the previous event of the same key exceeds
    * `gapSeconds`. One shuffle (by key), then window functions within
    * partitions. Returns per-session (key, session_id, start, end, n,
    * sum). */
  def sessions(events: DataFrame, tsCol: String, keyCol: String,
               gapSeconds: Long, valueCol: String): DataFrame = {
    val byKey = Window.partitionBy(keyCol).orderBy(col(tsCol), col("event_id"))
    // microsecond-exact gap (unix_timestamp would truncate to seconds and
    // disagree with interval arithmetic in an external oracle)
    val gap = unix_micros(col(tsCol)) - unix_micros(lag(col(tsCol), 1).over(byKey))
    val isNew = when(gap.isNull || gap > gapSeconds * 1000000L, 1L).otherwise(0L)
    events
      .withColumn("__new", isNew)
      .withColumn("session_id", sum(col("__new")).over(byKey))
      .groupBy(col(keyCol), col("session_id"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        dsum(col(valueCol)).as("sum_value"))
  }

  /** Top-k rows per group by a measure (rounded for cross-engine ties). */
  def topKPerGroup(df: DataFrame, keys: Seq[String], orderBy: Column,
                   tieBreak: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderBy.desc, tieBreak)
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
