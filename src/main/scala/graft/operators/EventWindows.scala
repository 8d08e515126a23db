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

  /** Trailing event-time rolling aggregate per ROW — the point-in-time
    * training-feature generator ("how many events / how much value did
    * this key produce in the last W?" attached to every event, with no
    * future leakage): count and exact-decimal sum of `valueCol` over the
    * same key's events with timestamps in `[ts - windowUs, ts]`
    * (inclusive both ends; equal-timestamp peers all count, the RANGE-
    * frame contract in every engine).
    *
    * ONE shuffle (the key) + a range-frame window — never the self-join
    * a naive point-in-time formulation pays (each row joined to its
    * trailing rows materializes the O(rows × window-population) pair
    * space the frame walks incrementally). Skew bound = hottest key,
    * same as any keyed window. */
  def rolling(events: DataFrame, tsCol: String, keyCol: String,
              valueCol: String, windowUs: Long): DataFrame = {
    require(windowUs >= 0, s"windowUs must be >= 0, got $windowUs")
    val w = Window.partitionBy(keyCol).orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-windowUs, 0)
    // dsum's outer double-cast must wrap the WINDOWED sum (cast(...).over
    // is not an aggregate), so the decimal sum attaches to the frame
    // first — value-identical to graft.functions.dsum per frame.
    // Null-ts rows get NULL features, not fabricated ones: null ordering
    // values form their own RANGE peer group, so without the gate a
    // key's malformed rows would count EACH OTHER as a trailing window —
    // a point-in-time feature for a row that has no point in time.
    // (Non-null rows are unaffected either way: a null bound comparison
    // never admits the null group into their frames.)
    val hasTs = col(tsCol).isNotNull
    events
      .withColumn("n_trailing", when(hasTs, count(lit(1)).over(w)))
      .withColumn("sum_trailing", when(hasTs,
        sum(col(valueCol).cast("decimal(28,6)")).over(w).cast("double")))
  }

  /** Top-k rows per group by a measure (rounded for cross-engine ties). */
  def topKPerGroup(df: DataFrame, keys: Seq[String], orderBy: Column,
                   tieBreak: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderBy.desc, tieBreak)
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
