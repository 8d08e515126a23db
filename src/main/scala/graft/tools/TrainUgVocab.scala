package graft.tools

/** One-shot generator for the embedded canonical unigram vocab
  * (`graft.UgVocab`): runs `unigramVocabTrain` on sf0.01 documents
  * (96 pieces, max piece length 6) and rewrites
  * `src/main/scala/graft/UgVocab.scala` in place. Rerun only when the
  * trainer or its corpus changes; UnigramSpec re-derives the table and
  * fails if the embed drifts.
  *
  * Usage: scripts/run.sh graft.tools.TrainUgVocab [sfDir] [pieces]
  */
object TrainUgVocab {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val pieces = args.lift(1).map(_.toInt).getOrElse(96)
    val docs = graft.Tables(spark, sfDir, "documents")
    val vocab = graft.operators.TextAnalysis.unigramVocabTrain(
      docs, "text", pieces)
    println(s"[train-ug] ${vocab.size} vocab entries")
    val body = vocab.map(v => "    \"" + v.replace("\\", "\\\\")
      .replace("\"", "\\\"").replace("\t", "\\t") + "\"").mkString(",\n")
    val src =
      s"""package graft
         |
         |/** The embedded canonical unigram-LM vocabulary (see
         |  * [[SparkEntry.ugCanonicalVocab]]) — generated ONCE by
         |  * `graft.tools.TrainUgVocab` (unigramVocabTrain on sf0.01
         |  * documents, $pieces pieces) and pinned by UnigramSpec, its own
         |  * file so the generator can rewrite it mechanically. Lines are
         |  * the published SentencePiece `.vocab` format. */
         |private[graft] object UgVocab {
         |  val lines: Seq[String] = Seq(
         |$body)
         |}
         |""".stripMargin
    val path = java.nio.file.Paths.get("src/main/scala/graft/UgVocab.scala")
    java.nio.file.Files.write(path, src.getBytes("UTF-8"))
    println(s"[train-ug] wrote $path")
    spark.stop()
  }
}
