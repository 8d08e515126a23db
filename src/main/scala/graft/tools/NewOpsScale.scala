package graft.tools

import org.apache.spark.sql.functions._

/** Scale-growth smoke for the late-round-11 operators:
  *
  *  - **Avro split reads**: ONE large container shard read at 1 GiB
  *    splits (one task) vs 1 MiB splits (many tasks) — claim: the
  *    sync-marker scan turns a single shard into parallel work, so the
  *    many-split read beats or matches the one-task read on a
  *    multi-core host (the gzip family CANNOT do this at any setting);
  *  - **SQ8 vs float brute-force top-k** over corpus replicas — claim:
  *    both scale linearly in corpus size (same nested-loop shape), SQ8
  *    carrying 4× less data per row through the scorer;
  *  - **Unigram vs WordPiece encode** over the same replicated corpus
  *    — claim: both are scan-level expressions with per-task word
  *    caches, so walls track each other and grow ~linearly (the
  *    Viterbi DP costs more per UNCACHED word but the cache amortizes
  *    it to the same regime);
  *  - **DSIR weights** over corpus replicas — claim: near-linear wall
  *    (bucket-bounded histogram exchange + broadcast delta + one doc
  *    aggregate; nothing grows with corpus size except the streams).
  *
  * Results are recorded in SCALE.md (round-11 section).
  * Usage: scripts/run.sh graft.tools.NewOpsScale [sfDir] [mults...]
  */
object NewOpsScale {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mults = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(1, 4, 16)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

    def time(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"  $label%-34s $s%8.2fs")
      s
    }

    def replicated(n: Int) =
      docs.withColumn("rep", explode(sequence(lit(0), lit(n - 1))))
        .select((col("doc_id") * n + col("rep")).as("doc_id"),
          col("lang"), col("source"),
          concat(col("text"), lit(" r"), col("rep")).as("text"))

    // ---- Avro split reads: one big shard, split width A/B ----
    println("== avro split reads (one shard, null codec)")
    val avroDir = java.nio.file.Files.createTempDirectory("graft_avro_scale")
    graft.sources.Avro.write(
      docs.withColumn("rep", explode(sequence(lit(0), lit(7))))
        .select((col("doc_id") * 8 + col("rep")).as("doc_id"), col("text")),
      avroDir.toString, files = 1, saltCol = "doc_id", codec = "null",
      blockRows = 512)
    val shard = new java.io.File(avroDir.toString).listFiles()
      .filter(_.getName.endsWith(".avro")).head
    println(f"  shard bytes: ${shard.length()}%d")
    for (_ <- 1 to 2) { // second round = warm file cache, report both
      val one = time("1 task (1 GiB splits)") {
        graft.sources.Avro.read(spark, shard.getPath, splitBytes = 1L << 30)
          .agg(count(lit(1)), sum(length(col("text")))).collect()
      }
      val many = time("fan-out (1 MiB splits)") {
        graft.sources.Avro.read(spark, shard.getPath, splitBytes = 1L << 20)
          .agg(count(lit(1)), sum(length(col("text")))).collect()
      }
      println(f"  speedup: ${one / many}%.2fx")
    }

    // ---- SQ8 vs float brute force ----
    println("== sq8 vs float brute-force top-k (5 queries)")
    for (m <- mults) {
      val corpus = emb.withColumn("rep", explode(sequence(lit(0), lit(m - 1))))
        .select((col("vec_id") * m + col("rep")).as("vec_id"),
          col("embedding"))
      val q = corpus.filter(col("vec_id") < 5)
      println(s" corpus x$m (${corpus.count()} vecs)")
      time(s"float bruteForceTopK x$m") {
        graft.operators.Similarity
          .bruteForceTopK(q, corpus, "vec_id", "embedding", 5).count()
      }
      time(s"sq8TopK x$m") {
        graft.operators.Similarity
          .sq8TopK(q, corpus, "vec_id", "embedding", 5).count()
      }
    }

    // ---- tokenizers + DSIR over replicas ----
    println("== unigram / wordpiece / dsir over corpus replicas")
    for (m <- mults) {
      val d = replicated(m)
      println(s" corpus x$m")
      time(s"unigram census x$m") {
        d.select(graft.operators.TextAnalysis
            .unigramEncode(col("text"), graft.UgVocab.lines).as("e"))
          .agg(sum(size(col("e.pieces"))), sum(col("e.score_micro")))
          .collect()
      }
      time(s"wordpiece census x$m") {
        d.select(graft.operators.TextAnalysis
            .wordPieceTokens(col("text"), graft.WpVocab.lines).as("p"))
          .agg(sum(size(col("p")))).collect()
      }
      time(s"dsir weights x$m") {
        graft.operators.Sampling.dsirWeights(d, "doc_id", "text",
          col("source") === "src0").agg(sum(col("logw_micro"))).collect()
      }
    }
    spark.stop()
  }
}
