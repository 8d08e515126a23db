package graft.tools

import org.apache.spark.sql.functions._

/** Scale-growth smoke for the trainer-handoff mile: documents
  * replicated mult× are tokenized (exact BPE, full canonical vocab),
  * packed into 128-token sequences (`Sampling.packSequences`), exported
  * as Megatron `.bin`/`.idx` shards (4·mult pairs) and read back; the
  * embeddings table replicated mult× round-trips safetensors shards the
  * same way. Parallelism is one task per shard on both sides of both
  * formats, with the pack stage's single lang-keyed exchange in front —
  * wall must track bytes ~linearly once the cores are fed.
  *
  * Usage: scripts/run.sh graft.tools.TrainerScale [sfDir] [mults...]
  */
object TrainerScale {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mults = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(1, 4, 16)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-18s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val merges = graft.SparkEntry.bpeCanonicalMerges
    val vocab = graft.expressions.BpeCodec.canonicalVocab(merges)

    for (m <- mults) {
      // ---- tokenize -> pack -> .bin/.idx -> read back
      val rep = docs
        .withColumn("rep", explode(sequence(lit(0), lit(m - 1))))
        .select((col("doc_id") * m + col("rep")).as("doc_id"),
          col("lang"), col("text"))
      // the operator's contract: SHARD-SIZED groups (here a doc-hash
      // bucket that grows with the corpus, so per-group work stays
      // constant as mult rises); the repartition spreads the BPE
      // projection across cores before the window's group exchange
      val packed = graft.operators.Sampling.packSequences(
        rep.repartition(col("doc_id"))
          .select(pmod(xxhash64(col("doc_id")), lit(4L * m)).as("shard"),
            col("doc_id"),
            graft.operators.TextAnalysis
              .bpeIdsExact(col("text"), merges, vocab).as("ids")),
        Seq("shard"), "doc_id", "ids", seqLen = 128, eosId = 288)
      val idxRoot = new java.io.File(
        sys.props("java.io.tmpdir"), s"graft_trainscale_idx_$m")
      time(s"packWrite x$m") {
        graft.sources.IndexedTokens.writeIndexed(
          packed.select(concat(col("shard"), lit(":"), col("seq")).as("k"),
            col("ids")),
          "ids", "k", idxRoot.getPath, 4 * m, dtype = "u16")
      }
      val binBytes = idxRoot.listFiles().filter(_.getName.endsWith(".bin"))
        .map(_.length).sum
      val r1 = time(s"packRead  x$m") {
        graft.sources.IndexedTokens.readIndexed(spark, s"$idxRoot/*.idx")
          .agg(count(lit(1)), sum(size(col("ids")))).head()
      }
      println(s"  idx: mult=$m files=${4 * m} binMB=${binBytes / 1000000} " +
        s"seqs=${r1.getLong(0)} tokens=${r1.getLong(1)}")

      // ---- embeddings -> safetensors -> read back
      val repE = embs
        .withColumn("rep", explode(sequence(lit(0), lit(m - 1))))
        .select((col("vec_id") * m + col("rep")).as("vec_id"),
          col("label"), col("embedding"))
      val stRoot = new java.io.File(
        sys.props("java.io.tmpdir"), s"graft_trainscale_st_$m")
      time(s"stWrite   x$m") {
        graft.sources.Safetensors.writeEmbeddings(repE,
          "vec_id", "label", "embedding", stRoot.getPath, 4 * m)
      }
      val stBytes = stRoot.listFiles()
        .filter(_.getName.endsWith(".safetensors")).map(_.length).sum
      val r2 = time(s"stRead    x$m") {
        graft.sources.Safetensors
          .readEmbeddings(spark, s"$stRoot/*.safetensors")
          .agg(count(lit(1)), sum(size(col("embedding")))).head()
      }
      println(s"  st: mult=$m files=${4 * m} MB=${stBytes / 1000000} " +
        s"vecs=${r2.getLong(0)} floats=${r2.getLong(1)}")
    }
    spark.stop()
  }
}
