package graft.tools

/** One-shot generator for the embedded canonical WordPiece vocab
  * (`graft.WpVocab`): trains `wordPieceTrain` on sf0.01 documents with
  * 48 merges and rewrites `src/main/scala/graft/WpVocab.scala` in
  * place. Rerun only when the trainer or its corpus changes;
  * WordPieceSpec re-derives the table and fails if the embed drifts.
  *
  * Usage: scripts/run.sh graft.tools.TrainWpVocab [sfDir] [numMerges]
  */
object TrainWpVocab {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val numMerges = args.lift(1).map(_.toInt).getOrElse(48)
    val docs = graft.Tables(spark, sfDir, "documents")
    val vocab = graft.operators.TextAnalysis.wordPieceTrain(
      docs, "text", numMerges)
    println(s"[train-wp] ${vocab.size} vocab entries")
    val body = vocab.map(v => "    \"" + v.replace("\\", "\\\\")
      .replace("\"", "\\\"") + "\"").mkString(",\n")
    val src =
      s"""package graft
         |
         |/** The embedded canonical WordPiece vocabulary (see
         |  * [[SparkEntry.wpCanonicalVocab]]) — generated ONCE by
         |  * `graft.tools.TrainWpVocab` (wordPieceTrain on sf0.01 documents,
         |  * $numMerges merges) and pinned by WordPieceSpec, its own file so the
         |  * generator can rewrite it mechanically. */
         |private[graft] object WpVocab {
         |  val lines: Seq[String] = Seq(
         |$body)
         |}
         |""".stripMargin
    val path = java.nio.file.Paths.get("src/main/scala/graft/WpVocab.scala")
    java.nio.file.Files.write(path, src.getBytes("UTF-8"))
    println(s"[train-wp] wrote $path")
    spark.stop()
  }
}
