package graft.tools

/** Dev: print the executed plan of one SparkEntry query. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val want = args.headOption.getOrElse("q01")
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val name = graft.SparkEntry.queries.keys.toSeq.sorted
      .find(_.contains(want)).getOrElse(sys.error(s"no query matching '$want'"))
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
