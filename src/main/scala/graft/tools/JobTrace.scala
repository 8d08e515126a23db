package graft.tools

/** Dev: run ONE SparkEntry query and print every Spark job it issues —
  * id, wall, stage count, task count, and the call site — so high
  * job-count queries (the iterative CC/PageRank family, the recipe DAG)
  * can be attributed job-by-job instead of guessed at.
  * Args: <name-substring> [sfDir] [passes]. */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val want = args.headOption.getOrElse("q01")
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.drop(2).headOption.map(_.toInt).getOrElse(2)
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val name = graft.SparkEntry.queries.keys.toSeq.sorted
      .find(_.contains(want)).getOrElse(sys.error(s"no query matching '$want'"))

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    val lines = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val site = js.stageInfos.lastOption.map(si =>
            si.name.take(60) + " tasks=" +
              js.stageInfos.map(_.numTasks).sum).getOrElse("?")
          jobs.put(js.jobId, (System.nanoTime(), site, js.stageInfos.size))
        }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val (t0, site, nStages) = jobs.getOrDefault(je.jobId, (0L, "?", 0))
          val ms = (System.nanoTime() - t0) / 1e6
          lines.add(f"job ${je.jobId}%4d ${ms}%8.1f ms  $nStages%3d stages  $site")
        }
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val ms = (for (a <- si.completionTime; b <- si.submissionTime)
            yield a - b).getOrElse(-1L)
          if (ms >= 200)
            lines.add(f"  stage ${si.stageId}%4d ${ms.toDouble}%8.1f ms " +
              f"${si.numTasks}%4d tasks  ${si.name.take(90)}")
        }
      })

    graft.corpus.ReferenceCorpus.ensure(spark, sfDir)
    for (pass <- 1 to passes) {
      lines.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      // listener events are async; give the bus a beat before printing
      Thread.sleep(300)
      println(s"=== pass $pass: $name  ${f"$dt%.2f"}s  ${lines.size} jobs ===")
      lines.forEach(println(_))
    }
    spark.stop()
  }
}
