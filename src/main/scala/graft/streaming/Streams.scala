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

  /** The current testdata vintage of the events table (TESTDATA.md):
    * micros timestamps surface as TIMESTAMP_NTZ. Used when a streaming
    * source directory is empty at query start and there is nothing to
    * probe. */
  val defaultEventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source streaming read of an events directory/file.
    *
    * `events.ts` has shipped in two testdata vintages — TIMESTAMP(NANOS)
    * (readable only as a raw long via the nanosAsLong flag) and
    * TIMESTAMP(MICROS) (surfacing as TIMESTAMP_NTZ). Mirror
    * [[graft.Tables]]' dispatch: probe the on-disk type with a
    * footer-only batch read (no data scan), then normalize to a
    * microsecond TimestampType column so streaming and batch operators
    * always see the same event time.
    *
    * The canonical file-stream pattern — watching a directory that is
    * EMPTY when the query starts and fills over time — has nothing to
    * probe; pass `schema` explicitly, or the probe falls back to
    * [[defaultEventsSchema]] (the current vintage). */
  def readEvents(spark: SparkSession, path: String,
                 schema: Option[StructType] = None,
                 options: Map[String, String] = Map.empty): DataFrame = {
    val onDisk = schema.getOrElse {
      try spark.read.parquet(path).schema
      catch {
        // "unable to infer schema" / path-not-yet-existing: empty watch dir
        case _: org.apache.spark.sql.AnalysisException => defaultEventsSchema
      }
    }
    // file-source options ride through (e.g. maxFilesPerTrigger to bound
    // micro-batch size; AvailableNow respects it)
    val stream = spark.readStream.schema(onDisk).options(options).parquet(path)
    onDisk("ts").dataType match {
      // nanos-as-long vintage: integer `div`, not `/` — double division
      // rounds half the rows up a microsecond vs an engine that floors
      case LongType => stream.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // micros vintage: NTZ -> session-TZ timestamp (identity only under
      // a UTC-equivalent session zone — same guard as the batch reader)
      case TimestampNTZType =>
        graft.Tables.requireUtcSession(spark)
        stream.withColumn("ts", col("ts").cast("timestamp"))
      case TimestampType => stream
      case other => throw new IllegalStateException(
        s"events.ts: unsupported parquet type $other (expected long/TIMESTAMP_NTZ/TIMESTAMP)")
    }
  }

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

  /** Streaming near-dup triage against a pre-built static corpus
    * index ([[graft.operators.Dedup.minhashIndex]] output, read back
    * from its parquet home in production): each micro-batch hashes
    * ONLY its own documents — the identical minhash/band construction
    * as the batch path — and equi-joins the static index on the band
    * key, so the 100 TB history is never re-scanned; the join reads
    * only the buckets the batch touches. Emits (new_id, corpus_id,
    * jaccard) pairs at/above `threshold`.
    *
    * Within-batch pairs are deliberately out of scope here (they are
    * the batch `incrementalMinhashCandidates`' second term, and a
    * stream-stream self-join would buffer unbounded state); streaming
    * triage against HISTORY + a periodic batch pass over each day's
    * increment is the production split.
    *
    * State bounding: with `eventTime = None` the pair-dedup state grows
    * with the stream's distinct pair volume (fine for bounded drains,
    * unbounded in production). When the source carries an event-time
    * column, pass `eventTime = Some(col -> lateness)`: the op watermarks
    * on it and uses `dropDuplicatesWithinWatermark`, so pair state is
    * EVICTED once the watermark passes — the production path. Within the
    * watermark the emitted pairs equal the unbounded-state form (asserted
    * by StreamingSpec); a pair recurring later than `lateness` after its
    * first emission may re-emit, the standard watermarked-dedup contract.
    * The event-time column rides through to the output. */
  def nearDupCandidates(newDocs: DataFrame, corpusIndex: DataFrame,
                        idCol: String, textCol: String, threshold: Double,
                        k: Int = 12, bands: Int = 4, shingleN: Int = 3,
                        eventTime: Option[(String, String)] = None): DataFrame = {
    import graft.operators.Dedup
    val tsCols = eventTime.map(_._1).toSeq
    val newIdx0 = Dedup.minhashIndex(newDocs, idCol, textCol, k, bands, shingleN,
        carry = tsCols)
      .select(col("bk") +: col("id").as("new_id") +: col("sh").as("new_sh") +:
        tsCols.map(col): _*)
    // watermark BEFORE the stream-static join (stateless) so it reaches
    // the downstream stateful dedup
    val newIdx = eventTime.fold(newIdx0) { case (ts, lateness) =>
      newIdx0.withWatermark(ts, lateness) }
    val pairs = newIdx.join(corpusIndex, Seq("bk"))
      .filter(col("new_id") =!= col("id"))
      .select(col("new_id") +: col("id").as("corpus_id") +:
        Dedup.jaccardSorted(col("new_sh"), col("sh")).as("jaccard") +:
        tsCols.map(col): _*)
      .filter(col("jaccard") >= threshold)
    eventTime match {
      case Some(_) => pairs.dropDuplicatesWithinWatermark("new_id", "corpus_id")
      case None => pairs.dropDuplicates("new_id", "corpus_id")
    }
  }

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

/** Custom-state streaming operators (KeyValueGroupedDataset +
  * flatMapGroupsWithState) — the escape hatch when built-in windows can't
  * express the state machine. */
object StatefulStreams {
  import org.apache.spark.sql.{Dataset, Encoders, Row}
  import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

  /** Streaming first-seen filter: emit only the first row per key ever
    * observed (state = one boolean per key; within a micro-batch the
    * winner is the smallest tieBreak, so results are deterministic).
    * The streaming form of Dedup.exact for unbounded ingestion. */
  def firstSeen(df: DataFrame, keyCol: String, tieBreak: String): Dataset[Row] = {
    val rowEnc = Encoders.row(df.schema)
    val tupEnc = Encoders.tuple(Encoders.STRING, rowEnc)
    val tieIdx = df.schema.fieldIndex(tieBreak)
    val keyed = df.map(r => (String.valueOf(r.getAs[Any](keyCol)), r))(tupEnc)
      .groupByKey(_._1)(Encoders.STRING)
    val tieOrd: Ordering[Any] = {
      case (x: Number, y: Number) => x.doubleValue.compareTo(y.doubleValue)
      case (x, y) => String.valueOf(x).compareTo(String.valueOf(y))
    }
    val fn = (_: String, rows: Iterator[(String, Row)], state: GroupState[Boolean]) =>
      if (state.exists) Iterator.empty
      else {
        state.update(true)
        val winner = rows.map(_._2).minBy(r => r.get(tieIdx))(tieOrd)
        Iterator.single(winner)
      }
    keyed.flatMapGroupsWithState[Boolean, Row](
      OutputMode.Append(), GroupStateTimeout.NoTimeout())(fn)(
      Encoders.scalaBoolean, rowEnc)
  }

  /** Streaming crawl-frontier dedup: [[firstSeen]] keyed on the
    * CANONICAL form of a URL column
    * ([[graft.operators.TextAnalysis.canonicalUrl]]), so the same page
    * fetched five ways (fragment, tracking params, default port, case,
    * trailing slash) emits exactly once — the online form of exact
    * canonical-URL dedup. State = one boolean per canonical URL. */
  def canonicalUrlFirstSeen(df: DataFrame, urlCol: String,
                            tieBreak: String): Dataset[Row] =
    firstSeen(
      df.withColumn("__curl",
        graft.operators.TextAnalysis.canonicalUrl(
          org.apache.spark.sql.functions.col(urlCol))),
      "__curl", tieBreak).drop("__curl")

  /** Streaming per-group KMV distinct estimate — the unbounded-ingestion
    * form of [[graft.operators.Profiling.distinctByGroup]]: state per
    * group is the same BOUNDED bottom-k distinct-hash sketch
    * ([[graft.expressions.LongKmvBuf]], serialized to <= 4+8k bytes), so
    * state size never grows with the distinct universe — the property
    * that makes running "distinct urls per source, updated per batch"
    * viable forever. Input: `groupCol` string + `hashCol` long
    * (pre-hashed with `TextAnalysis.hash60`, keeping the estimate
    * identical to the batch aggregate). Emits one
    * (group, n_seen, est_distinct) row per group per micro-batch —
    * after an AvailableNow drain, the row with the group's max n_seen
    * IS the batch answer (spec-pinned ≡ distinctByGroup). */
  def distinctSketch(df: DataFrame, groupCol: String, hashCol: String,
                     k: Int): Dataset[(String, Long, Double)] = {
    require(k >= 2, s"k must be >= 2, got $k")
    import graft.expressions.LongKmvBuf
    val tupEnc = Encoders.tuple(Encoders.STRING, Encoders.scalaLong)
    val keyed = df.map(r =>
        (String.valueOf(r.getAs[Any](groupCol)), r.getAs[Long](hashCol)))(tupEnc)
      .groupByKey(_._1)(Encoders.STRING)
    val outEnc =
      Encoders.tuple(Encoders.STRING, Encoders.scalaLong, Encoders.scalaDouble)
    val fn = (g: String, rows: Iterator[(String, Long)],
              state: GroupState[Array[Byte]]) => {
      val bytes = state.getOption.getOrElse(Array.emptyByteArray)
      var nSeen = 0L
      val buf =
        if (bytes.isEmpty) new LongKmvBuf(k)
        else {
          nSeen = java.nio.ByteBuffer.wrap(bytes, 0, 8).getLong
          LongKmvBuf.fromBytes(k, bytes.drop(8))
        }
      rows.foreach { case (_, h) => buf.insert(h); nSeen += 1 }
      val kmv = buf.toBytes
      val out = java.nio.ByteBuffer.allocate(8 + kmv.length)
      out.putLong(nSeen).put(kmv)
      state.update(out.array())
      val est =
        if (buf.size < k) buf.size.toDouble
        else (k - 1).toDouble * math.pow(2.0, 60) / buf.kth.toDouble
      Iterator.single((g, nSeen, est))
    }
    keyed.flatMapGroupsWithState[Array[Byte], (String, Long, Double)](
      OutputMode.Update(), GroupStateTimeout.NoTimeout())(fn)(
      Encoders.BINARY, outEnc)
  }

  /** Streaming heavy-hitter CANDIDATE tracking — the unbounded form of
    * [[graft.operators.Profiling.heavyHitters]]'s first phase: items are
    * sharded by a deterministic hash (every occurrence of an item lands
    * on ONE shard, so state parallelizes without breaking the
    * guarantee), and each shard maintains a k-counter Misra-Gries
    * summary across micro-batches. Any item whose total frequency
    * reaches `seen/(k+1)` of its shard's stream is guaranteed present —
    * with k = ⌈1/φ⌉, a superset of the φ-heavy hitters of everything
    * drained so far (spec-pinned vs the exact batch answer); counts are
    * lower bounds (true count ≤ count + seen/(k+1)). Confirm exact
    * counts downstream against the accumulated corpus, exactly like the
    * batch operator's second phase. Emits the shard's full current
    * summary each batch as (shard, item, count_lb, shard_seen); after a
    * drain, the rows carrying each shard's max shard_seen are the final
    * summaries. */
  def heavyHitterCandidates(df: DataFrame, itemCol: String, k: Int,
                            shards: Int = 32): Dataset[(Int, String, Long, Long)] = {
    require(k >= 1 && shards >= 1, s"need k>=1, shards>=1 (got $k, $shards)")
    val tupEnc = Encoders.tuple(Encoders.scalaInt, Encoders.STRING)
    val keyed = df.map { r =>
        val item = String.valueOf(r.getAs[Any](itemCol))
        (math.floorMod(item.hashCode, shards), item)
      }(tupEnc)
      .groupByKey(_._1)(Encoders.scalaInt)
    val outEnc = Encoders.tuple(Encoders.scalaInt, Encoders.STRING,
      Encoders.scalaLong, Encoders.scalaLong)
    val fn = (shard: Int, rows: Iterator[(Int, String)],
              state: GroupState[Array[Byte]]) => {
      var seen = 0L
      val counters = new java.util.LinkedHashMap[String, Long]()
      state.getOption.foreach { bytes =>
        val bb = java.nio.ByteBuffer.wrap(bytes)
        seen = bb.getLong
        val n = bb.getInt
        for (_ <- 0 until n) {
          val len = bb.getInt
          val sb = new Array[Byte](len)
          bb.get(sb)
          counters.put(new String(sb, "UTF-8"), bb.getLong)
        }
      }
      rows.foreach { case (_, item) =>
        seen += 1
        val c = counters.get(item)
        if (c > 0L) counters.put(item, c + 1L)
        else if (counters.size < k) counters.put(item, 1L)
        else {
          val it = counters.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
          }
        }
      }
      import scala.jdk.CollectionConverters._
      val entries = counters.entrySet().asScala.toSeq
      val payload = entries.map(e => (e.getKey.getBytes("UTF-8"), e.getValue))
      val bb = java.nio.ByteBuffer.allocate(
        12 + payload.map(p => 12 + p._1.length).sum)
      bb.putLong(seen).putInt(payload.size)
      payload.foreach { case (sb, c) => bb.putInt(sb.length).put(sb).putLong(c) }
      state.update(bb.array())
      val snapshotSeen = seen
      entries.iterator.map(e => (shard, e.getKey, e.getValue, snapshotSeen))
    }
    keyed.flatMapGroupsWithState[Array[Byte], (Int, String, Long, Long)](
      OutputMode.Update(), GroupStateTimeout.NoTimeout())(fn)(
      Encoders.BINARY, outEnc)
  }
}
