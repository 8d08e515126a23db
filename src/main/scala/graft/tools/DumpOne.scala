package graft.tools

/** Dev tool: run one SparkEntry query and write its result as a single
  * CSV (header included) — for ad-hoc diffing against an external
  * engine's output (e.g. the reference implementation's `-o` CSV).
  *
  * Usage: scripts/run.sh graft.tools.DumpOne q46 /root/testdata/sf0.1 /tmp/out.csv
  */
object DumpOne {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: DumpOne <query-substr> <sfDir> <out.csv>")
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val name = graft.SparkEntry.queries.keys.toSeq.sorted
      .find(_.contains(args(0))).getOrElse(sys.error(s"no query matching '${args(0)}'"))
    val df = graft.SparkEntry.queries(name)(spark, args(1))
    val tmp = java.nio.file.Files.createTempDirectory("graft_dump")
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(tmp.toString)
    val part = java.nio.file.Files.list(tmp)
      .filter(_.getFileName.toString.endsWith(".csv")).findFirst().get()
    java.nio.file.Files.move(part, java.nio.file.Paths.get(args(2)),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    System.err.println(s"$name -> ${args(2)}")
    spark.stop()
  }
}
