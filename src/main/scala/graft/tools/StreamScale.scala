package graft.tools

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

/** Streaming throughput smoke: the events table replicated N× along the
  * EVENT-TIME axis (replica r shifted +31r days, ids offset) and staged
  * as one parquet file per replica with strictly increasing mtimes — the
  * shape of a log directory filling over months, compressed into one
  * drain. The query is the production tumbling-window aggregate
  * ([[graft.streaming.Streams.tumbling]], 1-hour windows, 1-hour
  * lateness) with maxFilesPerTrigger=1, so each replica is one
  * micro-batch and the watermark advances ~31 days between batches:
  * every prior replica's window state is EVICTED before the next batch
  * lands. A scale-safe streaming plan must therefore show
  *  - wall growing ~linearly in N (per-batch cost is flat: state at any
  *    moment is one replica's window count, not N×),
  *  - emitted windows = N × per-replica windows MINUS only the final
  *    batch's watermark-held tail (append mode emits a window once the
  *    watermark passes it; the stream ends with the last ~lateness of
  *    windows still open, while every earlier replica emits fully
  *    because the next batch's 31-day jump closes it — eviction never
  *    drops an in-order event),
  * which is what distinguishes watermarked state from an unbounded
  * accumulate-everything plan whose per-batch cost would grow with N.
  *
  * Usage: scripts/run.sh graft.tools.StreamScale [sfDir] [mults...]
  */
object StreamScale {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mults = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 4, 16)
    val events = graft.Tables(spark, sfDir, "events")

    /** Write `df` as exactly one parquet file named so lexical order =
      * arrival order, with an explicit strictly-increasing mtime (the
      * file source orders by modification time). */
    def stageOne(df: org.apache.spark.sql.DataFrame, watch: Path, seq: Int): Unit = {
      val tmp = Files.createTempDirectory("graft_streamscale_stage")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet"))
        .findFirst().get()
      val dest = watch.resolve(f"rep_$seq%04d.parquet")
      Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + seq * 60000L))
    }

    println(f"${"mult"}%-6s${"events"}%-10s${"windows"}%-9s${"wall_s"}%-8s")
    for (n <- mults) {
      val watch = Files.createTempDirectory(s"graft_streamscale_$n")
      (0 until n).foreach { r =>
        stageOne(
          events
            .withColumn("ts", col("ts") + expr(s"INTERVAL ${r * 31} DAYS"))
            .withColumn("event_id", col("event_id") + lit(r.toLong * 100000000L)),
          watch, r)
      }
      val total = spark.read.parquet(watch.toString).count()
      val t0 = System.nanoTime()
      val stream = graft.streaming.Streams.readEvents(spark, watch.toString,
        options = Map("maxFilesPerTrigger" -> "1"))
      val agg = graft.streaming.Streams.tumbling(stream,
        width = "1 hour", lateness = "1 hour", keys = Seq("event_type"))
      val out = graft.streaming.Streams.drainToMemory(spark, agg,
        s"streamscale_$n", complete = false)
      val windows = out.count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"$n%-6d$total%-10d$windows%-9d$wall%-8.2f")
      spark.catalog.dropTempView(s"streamscale_$n")
    }
    spark.stop()
  }
}
