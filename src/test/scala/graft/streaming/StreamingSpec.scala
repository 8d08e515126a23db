package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.EventWindows

/** Streaming results must converge to the batch ground truth once the
  * bounded stream drains. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  /** the file-stream source requires a DIRECTORY; stage the single
    * parquet file into one */
  private lazy val eventsPath: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sfDir}/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("readEvents normalizes the on-disk vintage identically to Tables") {
    // Guard against vintage drift: whatever parquet encoding events.ts
    // ships with, the streaming and batch readers must agree exactly.
    val streamed = Streams.drainToMemory(spark,
      Streams.readEvents(spark, eventsPath).select(col("ts")),
      "vintage_guard", complete = false)
    val batch = graft.Tables(spark, TestSpark.sfDir, "events").select(col("ts"))
    assert(streamed.schema("ts").dataType == batch.schema("ts").dataType)
    val Array(sMin, sMax) = streamed.agg(min("ts"), max("ts")).collect()(0)
      .toSeq.toArray
    val Array(bMin, bMax) = batch.agg(min("ts"), max("ts")).collect()(0)
      .toSeq.toArray
    assert(sMin == bMin && sMax == bMax)
    assert(streamed.count() == batch.count())
  }

  test("readEvents accepts a watch directory that is empty at query construction") {
    // the canonical file-source pattern: the directory fills AFTER the
    // stream is declared; the schema probe must not throw on nothing
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_empty")
    val stream = Streams.readEvents(spark, dir.toString) // must not throw
    assert(stream.isStreaming)
    assert(stream.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    // files land before the drain: results equal the batch read
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sfDir}/events.parquet"),
      dir.resolve("events.parquet"))
    val drained = Streams.drainToMemory(spark, stream.select(col("ts")),
      "empty_dir_test", complete = false)
    assert(drained.count() ==
      graft.Tables(spark, TestSpark.sfDir, "events").count())
  }

  test("UTC-equivalent zone spellings all pass the NTZ cast guard") {
    for (tz <- Seq("UTC", "Etc/UTC", "GMT", "Z", "+00:00"))
      assert(graft.Tables.isUtcEquivalent(tz), tz)
    for (tz <- Seq("America/New_York", "Europe/Berlin", "+01:00", "bogus"))
      assert(!graft.Tables.isUtcEquivalent(tz), tz)
  }

  test("streaming tumbling window == batch tumbling window") {
    val stream = Streams.readEvents(spark, eventsPath)
    val streamed = Streams.drainToMemory(spark,
      Streams.tumbling(stream, "1 hour", "1 hour", Seq("event_type")),
      "tumbling_test")
    val batch = EventWindows.tumbling(
      graft.Tables(spark, TestSpark.sfDir, "events"), "ts", "1 hour",
      Seq("event_type"), "value")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    assert(streamed.count() > 0)
  }

  test("streaming session windows match batch gaps-and-islands sessions") {
    val stream = Streams.readEvents(spark, eventsPath)
    val streamed = Streams.drainToMemory(spark,
      Streams.sessions(stream, "30 minutes", "1 hour", "user_id"),
      "sessions_test")
    val batch = EventWindows.sessions(
      graft.Tables(spark, TestSpark.sfDir, "events"), "ts", "user_id",
      gapSeconds = 1800, "value")
    // compare on (user, start, n, sum): session_window's end is
    // last_ts + gap, while the batch form reports the last event ts
    val a = streamed.select(col("user_id"), col("session_start"),
      col("n_events"), col("sum_value"))
    val b = batch.select(col("user_id"), col("session_start"),
      col("n_events"), col("sum_value"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(a.count() > 0)
  }

  test("hash split/sample are stateless — streaming == batch row-for-row") {
    import graft.operators.Sampling
    val stream = Streams.readEvents(spark, eventsPath)
    val labeled = Sampling.hashSplit(
      Sampling.hashSample(stream.toDF(), "event_id", 0.5), "event_id",
      Seq("train" -> 0.9, "test" -> 0.1))
      .select(col("event_id"), col("split"))
    val streamed = Streams.drainToMemory(spark, labeled, "hashsplit_test",
      complete = false)
    val batch = Sampling.hashSplit(
      Sampling.hashSample(graft.Tables(spark, TestSpark.sfDir, "events"),
        "event_id", 0.5), "event_id",
      Seq("train" -> 0.9, "test" -> 0.1))
      .select(col("event_id"), col("split"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("streaming near-dup triage == batch incremental candidates (new-vs-old)") {
    import graft.operators.Dedup
    val docs = graft.Tables(spark, TestSpark.sfDir, "documents")
    val hist = docs.filter(col("doc_id") % 5 =!= 0)
    val batchDocs = docs.filter(col("doc_id") % 5 === 0)
    val corpusIdx = Dedup.minhashIndex(hist, "doc_id", "text", k = 12, bands = 4)

    // stage the "new batch" as a parquet directory and stream it
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_docs")
    batchDocs.select("doc_id", "text").write.mode("overwrite").parquet(dir.toString)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema).parquet(dir.toString)

    val streamed = Streams.drainToMemory(spark,
      Streams.nearDupCandidates(stream, corpusIdx, "doc_id", "text", 0.5),
      "neardup_test", complete = false)
      .select(least(col("new_id"), col("corpus_id")).as("a"),
        greatest(col("new_id"), col("corpus_id")).as("b"),
        round(col("jaccard"), 9).as("j"))

    // ground truth: the batch incremental path, restricted to pairs with
    // exactly ONE new side (the streaming op triages against history only)
    val batch = Dedup.incrementalMinhashCandidates(
      corpusIdx, batchDocs, "doc_id", "text", k = 12, bands = 4)
      .filter(col("jaccard") >= 0.5)
      .filter((col("id_a") % 5 === 0) =!= (col("id_b") % 5 === 0))
      .select(col("id_a").as("a"), col("id_b").as("b"),
        round(col("jaccard"), 9).as("j"))

    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("watermarked near-dup triage (state-bounded) == unbounded form within the watermark") {
    import graft.operators.Dedup
    val docs = graft.Tables(spark, TestSpark.sfDir, "documents")
    val hist = docs.filter(col("doc_id") % 5 =!= 0)
    val batchDocs = docs.filter(col("doc_id") % 5 === 0)
      // event-time-carrying docs: a deterministic per-doc arrival time
      .withColumn("ts", timestamp_seconds(lit(1700000000L) + col("doc_id")))
    val corpusIdx = Dedup.minhashIndex(hist, "doc_id", "text", k = 12, bands = 4)

    val dir = java.nio.file.Files.createTempDirectory("graft_stream_docs_wm")
    batchDocs.select("doc_id", "text", "ts").write.mode("overwrite").parquet(dir.toString)
    val stream = spark.readStream
      .schema(batchDocs.select("doc_id", "text", "ts").schema)
      .parquet(dir.toString)

    val bounded = Streams.drainToMemory(spark,
      Streams.nearDupCandidates(stream, corpusIdx, "doc_id", "text", 0.5,
        eventTime = Some("ts" -> "1 hour")),
      "neardup_wm_test", complete = false)
      .select(col("new_id"), col("corpus_id"), round(col("jaccard"), 9).as("j"))
    // ground truth: the unbounded-state batch path over the same docs
    val unbounded = Streams.nearDupCandidates(
        batchDocs.select("doc_id", "text"), corpusIdx, "doc_id", "text", 0.5)
      .select(col("new_id"), col("corpus_id"), round(col("jaccard"), 9).as("j"))
    assert(bounded.count() > 0)
    assert(bounded.exceptAll(unbounded).isEmpty &&
      unbounded.exceptAll(bounded).isEmpty)
  }

  test("trained-classifier scoring is stateless — streaming == batch row-for-row") {
    import graft.operators.TextAnalysis
    val batchDocs = graft.Tables(spark, TestSpark.sfDir, "documents")
    val w6 = TextAnalysis.trainHashClassifier(
      batchDocs.withColumn("y",
        when(col("source") === "src0", 1L).otherwise(0L)),
      "doc_id", "text", "y", dim = 64, iters = 2)
    def score(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
        TextAnalysis.hashClassifierScoreWith(col("text"), w6.toSeq, 64).as("s"))
    // stage the single parquet file into a directory (file-stream source
    // requires one), same as eventsPath
    val docsDir = java.nio.file.Files.createTempDirectory("graft_clsf_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sfDir}/documents.parquet"),
      docsDir.resolve("documents.parquet"))
    val stream = spark.readStream.schema(batchDocs.schema)
      .parquet(docsDir.toString)
    val streamed = Streams.drainToMemory(spark, score(stream),
      "clsf_stream_test", complete = false)
    val batch = score(batchDocs)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("DSIR scoring under a frozen delta vector is stateless — " +
    "streaming == batch row-for-row, and == the training-time weights") {
    import graft.operators.Sampling
    val batchDocs = graft.Tables(spark, TestSpark.sfDir, "documents")
    val deltas = Sampling.dsirDeltasDense(batchDocs, "text",
      col("source") === "src0", buckets = 256).toSeq
    def score(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
        Sampling.dsirScoreWith(col("text"), deltas).as("logw_micro"))
    val docsDir = java.nio.file.Files.createTempDirectory("graft_dsir_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sfDir}/documents.parquet"),
      docsDir.resolve("documents.parquet"))
    val stream = spark.readStream.schema(batchDocs.schema)
      .parquet(docsDir.toString)
    val streamed = Streams.drainToMemory(spark, score(stream),
      "dsir_stream_test", complete = false)
    val batch = score(batchDocs)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    // the frozen-vector path reproduces the training-time weights
    // exactly (every corpus feature was seen at training)
    val trained = Sampling.dsirWeights(batchDocs, "doc_id", "text",
        col("source") === "src0", buckets = 256)
      .select(col("doc_id"), col("logw_micro"))
    assert(batch.exceptAll(trained).isEmpty && trained.exceptAll(batch).isEmpty)
  }

  test("HTML extraction + script-routed langId are stateless — the crawl " +
    "ingest stage runs on a stream row-for-row equal to batch") {
    import graft.operators.{Html, TextAnalysis}
    val batchDocs = graft.Tables(spark, TestSpark.sfDir, "documents")
    def ingest(df: org.apache.spark.sql.DataFrame) =
      Html.syntheticPages(df).select(col("doc_id"),
        Html.extractText(col("html")).as("text2"),
        size(Html.links(col("html"))).as("n_links"))
        .withColumn("guess", TextAnalysis.langId(col("text2")))
    val docsDir = java.nio.file.Files.createTempDirectory("graft_html_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sfDir}/documents.parquet"),
      docsDir.resolve("documents.parquet"))
    val stream = spark.readStream.schema(batchDocs.schema)
      .parquet(docsDir.toString)
    val streamed = Streams.drainToMemory(spark, ingest(stream),
      "html_stream_test", complete = false)
    val batch = ingest(batchDocs)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("the round-11 curation gates are stateless — confidence-scored " +
    "langId + Gopher + C4 run on a stream row-for-row equal to batch") {
    import graft.operators.TextAnalysis
    val batchDocs = graft.Tables(spark, TestSpark.sfDir, "documents")
    // the q164 gate chain minus its (stateful) dedup stage: the ingest
    // filter a streaming curation front-end actually runs per document
    def gates(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
          TextAnalysis.langIdScored(col("text")).as("g"),
          TextAnalysis.gopherKeep(col("text")).as("gk"),
          TextAnalysis.gopherRepetitionKeep(col("text")).as("rk"),
          TextAnalysis.c4PageKeep(TextAnalysis.c4LineClean(col("text")))
            .as("ck"))
        .select(col("doc_id"), col("g.lang").as("lang"),
          col("g.score").as("score"),
          (col("g.lang") === "en" && col("g.score") >= 0.5 &&
            col("gk") && col("rk") && col("ck")).as("keep"))
    val docsDir = java.nio.file.Files.createTempDirectory("graft_gate_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sfDir}/documents.parquet"),
      docsDir.resolve("documents.parquet"))
    val stream = spark.readStream.schema(batchDocs.schema)
      .parquet(docsDir.toString)
    val streamed = Streams.drainToMemory(spark, gates(stream),
      "gates_stream_test", complete = false)
    val batch = gates(batchDocs)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("encoding repair + SURT keys are stateless — mojibake fix, NFC " +
    "and the CDX key run on a stream row-for-row equal to batch") {
    import graft.operators.TextAnalysis
    val batchDocs = graft.Tables(spark, TestSpark.sfDir, "documents")
    def repair(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"),
      TextAnalysis.fixMojibake(
        concat(lit("caf\u00c3\u00a9 "), col("text"))).as("fixed"),
      TextAnalysis.nfcNormalize(
        concat(lit("e\u0301"), col("text"))).as("composed"),
      TextAnalysis.surtKey(concat(lit("https://www.h"),
        (col("doc_id") % 7).cast("string"),
        lit(".example/p/"), col("doc_id").cast("string"))).as("surt"))
    val docsDir = java.nio.file.Files.createTempDirectory("graft_enc_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sfDir}/documents.parquet"),
      docsDir.resolve("documents.parquet"))
    val stream = spark.readStream.schema(batchDocs.schema)
      .parquet(docsDir.toString)
    val streamed = Streams.drainToMemory(spark, repair(stream),
      "enc_stream_test", complete = false)
    val batch = repair(batchDocs)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("curation gates are stateless — Gopher repetition, C4 rules and the " +
    "robots decision run on a stream row-for-row equal to batch") {
    import graft.operators.TextAnalysis
    val batchDocs = graft.Tables(spark, TestSpark.sfDir, "documents")
    val robotsTxt = "User-agent: *\nDisallow: /page/1\nAllow: /page/12$"
    def gates(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
        TextAnalysis.gopherRepetitionKeep(col("text")).as("rep_keep"),
        TextAnalysis.c4PageKeep(TextAnalysis.c4LineClean(col("text")))
          .as("c4_keep"),
        TextAnalysis.robotsAllowed(lit(robotsTxt), "graftbot",
          concat(lit("/page/"), (col("doc_id") % 20).cast("string")))
          .as("robots_ok"))
    val docsDir = java.nio.file.Files.createTempDirectory("graft_gate_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sfDir}/documents.parquet"),
      docsDir.resolve("documents.parquet"))
    val stream = spark.readStream.schema(batchDocs.schema)
      .parquet(docsDir.toString)
    val streamed = Streams.drainToMemory(spark, gates(stream),
      "gate_stream_test", complete = false)
    val batch = gates(batchDocs)
    assert(streamed.count() > 0)
    // both robots outcomes must be live in the fixture
    assert(batch.filter(col("robots_ok")).count() > 0 &&
      batch.filter(!col("robots_ok")).count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("as-of enrichment of a stream against a static side == batch asofJoin") {
    import graft.operators.Joins
    val ev = graft.Tables(spark, TestSpark.sfDir, "events")
    val l = ev.filter(col("event_type") === "purchase")
      .select("event_id", "ts", "user_id", "value")
    val clicks = ev.filter(col("event_type") === "click")
    // the batch ground truth is the union-and-sweep operator itself
    val batch = Joins.asofJoin(l, clicks, Seq("user_id"), "ts", "ts",
      Seq("event_id", "value"), "event_id")
    // stream the left side from a staged directory; right side static
    val stream = Streams.readEvents(spark, eventsPath)
      .filter(col("event_type") === "purchase")
      .select("event_id", "ts", "user_id", "value")
    val streamed = Streams.drainToMemory(spark,
      Joins.asofJoinStatic(stream, clicks, Seq("user_id"), "ts", "ts",
        Seq("event_id", "value"), "event_id"),
      "asof_stream_test", complete = false)
    assert(streamed.count() === l.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  /** documents staged as THREE files + maxFilesPerTrigger=1, so the
    * stateful operators below are exercised across MULTIPLE micro-batches
    * (state serialize/merge, not just one-shot). */
  private lazy val docsMultiBatchDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_docs_mb")
    graft.Tables(spark, TestSpark.sfDir, "documents")
      .repartition(3).write.mode("overwrite").parquet(dir.toString)
    dir.toString
  }

  private def docsStream = {
    val schema = graft.Tables(spark, TestSpark.sfDir, "documents").schema
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(docsMultiBatchDir)
  }

  private def drainUpdate(df: org.apache.spark.sql.DataFrame,
                          name: String): org.apache.spark.sql.DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  test("streaming KMV distinctSketch drains to the batch distinctByGroup answer") {
    import graft.operators.{Profiling, TextAnalysis}
    val k = 256
    def shingled(df: org.apache.spark.sql.DataFrame) = df.select(col("lang"),
      explode(TextAnalysis.wordShingles(col("text"), 3)).as("sh"))
    val hashed = shingled(docsStream)
      .select(col("lang"), TextAnalysis.hash60(col("sh")).as("h"))
    val out = drainUpdate(
      StatefulStreams.distinctSketch(hashed, "lang", "h", k).toDF(),
      "kmv_stream_test")
    // multiple micro-batches actually ran: some group emitted > 1 row
    assert(out.groupBy("_1").count().agg(max("count")).head().getLong(0) > 1)
    // the final emission per group (max rows-seen) IS the batch estimate
    val finals = out.groupBy(col("_1").as("lang"))
      .agg(max_by(col("_3"), col("_2")).as("est_distinct"),
        max(col("_2")).as("n_seen"))
    val batchDocs = graft.Tables(spark, TestSpark.sfDir, "documents")
    val expected = Profiling.distinctByGroup(
      shingled(batchDocs), Seq(col("lang")), col("sh"), k)
    val got = finals.select(col("lang"), col("est_distinct"))
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    // n_seen accounting: every shingle row of the group passed through
    val rowCounts = shingled(batchDocs).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    finals.collect().foreach(r => assert(r.getLong(2) == rowCounts(r.getString(0))))
  }

  test("streaming Misra-Gries candidates superset the exact heavy hitters " +
    "and confirm to the exact batch answer") {
    import graft.operators.{Profiling, TextAnalysis}
    val phi = 0.005
    val k = 200 // ceil(1/phi): phi > 1/(k+1) keeps the MG guarantee
    def toks(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
    val out = drainUpdate(
      StatefulStreams.heavyHitterCandidates(toks(docsStream), "tok", k,
        shards = 8).toDF(),
      "hh_stream_test")
    // final summary per shard = the rows carrying that shard's max seen
    val finals = out.groupBy(col("_1").as("shard"))
      .agg(max(col("_4")).as("seen"))
      .join(out, col("shard") === col("_1") && col("seen") === col("_4"))
      .select(col("_2").as("item"), col("_3").as("cnt_lb"), col("shard"),
        col("seen"))
    val candidates = finals.select("item").distinct()
    // per-shard summaries are bounded by k
    finals.groupBy("shard").count().collect()
      .foreach(r => assert(r.getLong(1) <= k, s"shard ${r.get(0)} over k"))
    val batchToks = toks(graft.Tables(spark, TestSpark.sfDir, "documents"))
    val exact = Profiling.heavyHitters(batchToks, col("tok"), phi)
    // SUPERSET guarantee: every true phi-heavy item is a candidate
    assert(exact.select(col("item"))
      .join(candidates, Seq("item"), "left_anti").isEmpty)
    // MG counts are lower bounds on true counts
    val trueCounts = batchToks.groupBy(col("tok").as("item"))
      .agg(count(lit(1)).as("cnt"))
    assert(finals.join(trueCounts, "item")
      .filter(col("cnt_lb") > col("cnt")).isEmpty)
    // confirm phase over the accumulated corpus == the exact batch answer
    val n = batchToks.count()
    val confirmed = batchToks.join(broadcast(candidates),
        col("tok") === col("item"))
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= math.ceil(phi * n).toLong)
    assert(confirmed.exceptAll(exact).isEmpty && exact.exceptAll(confirmed).isEmpty)
  }

  test("streaming canonical-URL firstSeen: every page emits once across " +
    "fetch variants and micro-batches") {
    import graft.operators.TextAnalysis
    def withUrls(df: org.apache.spark.sql.DataFrame) = {
      val host = concat(lit("Example"), (col("doc_id") % 7).cast("string"),
        lit(".COM"))
      val path = concat(lit("/Page/"), col("doc_id").cast("string"))
      df.select(col("doc_id"), explode(array(
        concat(lit("https://"), lower(host), path),
        concat(lit("HTTPS://"), host, lit(":443"), path,
          lit("/?utm_source=x#f")))).as("url"))
    }
    val out = Streams.drainToMemory(spark,
      StatefulStreams.canonicalUrlFirstSeen(
        withUrls(docsStream), "url", "doc_id").toDF(),
      "curl_firstseen_test", complete = false)
    val docs = graft.Tables(spark, TestSpark.sfDir, "documents")
    assert(out.count() == docs.count())
    // one distinct canonical form per emission — no variant leaked through
    assert(out.select(TextAnalysis.canonicalUrl(col("url")))
      .distinct().count() == docs.count())
  }

  test("stateful firstSeen dedup emits exactly one row per key") {
    val stream = Streams.readEvents(spark, eventsPath)
    val deduped = StatefulStreams.firstSeen(stream, "user_id", "event_id")
    val out = Streams.drainToMemory(spark, deduped.toDF(), "firstseen_test",
      complete = false)
    val batch = graft.Tables(spark, TestSpark.sfDir, "events")
    val users = batch.select("user_id").distinct().count()
    assert(out.count() == users)
    // winner per key is the min event_id of the batch
    val expected = graft.operators.Dedup.exact(batch, Seq("user_id"), "event_id")
      .select("user_id", "event_id")
    val got = out.select("user_id", "event_id")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }
}
