package graft.tools

import org.apache.spark.sql.functions._

/** Scale-growth smoke for the WARC path: the synthetic page corpus
  * replicated mult× is exported via `Warc.writeWarc` (4·mult shards —
  * shard count grows with the corpus, as a real crawl's does) and read
  * back through `Warc.readWarc`. Parallelism is one task per file on
  * BOTH sides, so wall must track bytes ~linearly once the cores are
  * fed; nothing is ever driver-side.
  *
  * Usage: scripts/run.sh graft.tools.WarcScale [sfDir] [mults...]
  */
object WarcScale {
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
    for (m <- mults) {
      val root = new java.io.File(
        sys.props("java.io.tmpdir"), s"graft_warcscale_$m")
      val rep = docs
        .withColumn("rep", explode(sequence(lit(0), lit(m - 1))))
        .select((col("doc_id") * m + col("rep")).as("doc_id"),
          col("lang"), col("text"))
      val pages = graft.operators.Html.syntheticPages(rep)
        .select(concat(lit("https://corpus.local/"), col("lang"), lit("/"),
          col("doc_id")).as("uri"), col("html"))
      if (!new java.io.File(root, ".complete").isFile) {
        time(s"warcWrite x$m") {
          graft.sources.Warc.writeWarc(pages, "uri", "html",
            root.getPath, 4 * m, "2026-01-01T00:00:00Z")
        }
        java.nio.file.Files.write(
          root.toPath.resolve(".complete"), Array.emptyByteArray)
      }
      val gzBytes = root.listFiles().filter(_.getName.endsWith(".gz"))
        .map(_.length).sum
      val r = time(s"warcRead  x$m") {
        graft.sources.Warc.readWarc(spark, s"$root/part-*.warc.gz")
          .filter(col("http_status") === 200)
          .agg(count(lit(1)).as("n"), sum(length(col("body"))).as("b"))
          .head()
      }
      println(s"  mult=$m files=${4 * m} gzMB=${gzBytes / 1000000} " +
        s"rows=${r.getLong(0)} bodyMB=${r.getLong(1) / 1000000}")
    }
    spark.stop()
  }
}
