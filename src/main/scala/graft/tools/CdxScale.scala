package graft.tools

import org.apache.spark.sql.functions._

/** Scale-growth smoke for the CDX random-access path: the synthetic
  * page corpus replicated mult× is exported via `writeWarcIndexed`
  * (per-record gzip members + CDX sidecars, 4·mult shards), then read
  * back two ways — the FULL stream (`readWarc`) and a ~2% CDX slice
  * point-read through `fetchRecords`. The claim under test: the
  * point-read wall tracks the SLICE, not the archive — the property
  * that makes a 0.1% fetch from a 100 TB archive cost 0.1% of the
  * bytes.
  *
  * Usage: scripts/run.sh graft.tools.CdxScale [sfDir] [mults...]
  */
object CdxScale {
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
        sys.props("java.io.tmpdir"), s"graft_cdxscale_$m")
      if (!new java.io.File(root, ".complete").isFile) {
        val rep = docs
          .withColumn("rep", explode(sequence(lit(0), lit(m - 1))))
          .select((col("doc_id") * m + col("rep")).as("doc_id"),
            col("lang"), col("text"))
        val pages = graft.operators.Html.syntheticPages(rep)
          .select(concat(lit("https://corpus.local/"), col("lang"), lit("/"),
            col("doc_id")).as("uri"), col("html"))
        time(s"cdxWrite  x$m") {
          graft.sources.Warc.writeWarcIndexed(pages, "uri", "html",
            root.getPath, 4 * m, "2026-01-01T00:00:00Z")
        }
        java.nio.file.Files.write(
          root.toPath.resolve(".complete"), Array.emptyByteArray)
      }
      val gzBytes = root.listFiles().filter(_.getName.endsWith(".warc.gz"))
        .map(_.length).sum
      val full = time(s"streamAll x$m") {
        graft.sources.Warc.readWarc(spark, s"$root/part-*.warc.gz")
          .agg(count(lit(1)), sum(length(col("body")))).head()
      }
      // a fixed ~2% md5 slice of the urls — the slice SIZE grows with
      // the corpus but its FRACTION stays constant, so point-read wall
      // growing ~linearly in mult is the pass condition (it reads 2% of
      // bytes at every scale, never the whole archive)
      val slice = graft.sources.Warc.readCdx(spark, root.getPath)
        .filter(graft.operators.Sampling
          .hashBucket(col("url"), "cdxscale", 1000000) < 20000)
      val fetched = time(s"fetch2%%   x$m") {
        graft.sources.Warc.fetchRecords(slice, root.getPath)
          .agg(count(lit(1)), sum(length(col("body")))).head()
      }
      println(s"  mult=$m files=${4 * m} gzMB=${gzBytes / 1000000} " +
        s"streamRows=${full.getLong(0)} fetchRows=${fetched.getLong(0)} " +
        s"fetchMB=${fetched.getLong(1) / 1000000}")
    }
    spark.stop()
  }
}
