package graft.tools

/** Dev: dump `.explain("formatted")` for a set of SparkEntry queries to
  * files — the plan evidence the optimization rounds commit under
  * plans/rNN/. Args: <outDir> <suffix> <name-substring>[,<substring>...]
  * [sfDir]; every query whose name contains one of the substrings is
  * explained at sfDir (default sf0.001 — plan SHAPE is sf-independent;
  * AQE leaves `isFinalPlan=false` markers either way) and written to
  * `<outDir>/<full-query-name>_<suffix>.txt`. */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: ExplainDump <outDir> <suffix> <substrings,comma-sep> [sfDir]")
    val outDir = new java.io.File(args(0))
    val suffix = args(1)
    val wants = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = args.drop(3).headOption.getOrElse("/root/testdata/sf0.001")
    outDir.mkdirs()
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => wants.exists(n.contains))
    require(names.nonEmpty, s"no query matches any of ${wants.mkString(",")}")
    for (name <- names) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val f = new java.io.File(outDir, s"${name}_$suffix.txt")
      java.nio.file.Files.write(f.toPath, plan.getBytes("UTF-8"))
      println(s"wrote ${f.getPath} (${plan.length} bytes)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
