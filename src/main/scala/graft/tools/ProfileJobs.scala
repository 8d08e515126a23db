package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev profiler: runs one SparkEntry query and prints every Spark job it
  * launches (id + call site) plus wall time. Eager driver-side jobs
  * (collects during plan construction, cache fills, pivot-value probes)
  * are invisible in wall time alone; at cluster scale each is a full
  * pass over the data, so the per-query job count is a first-class
  * efficiency metric — the bench prints it, this tool attributes it.
  *
  * Usage: scripts/run.sh graft.tools.ProfileJobs q46 [sfDir]
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val want = args.headOption.getOrElse("q01")
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val name = graft.SparkEntry.queries.keys.toSeq.sorted
      .find(_.contains(want))
      .getOrElse(sys.error(s"no query matching '$want'"))
    val spark = graft.GraftSession.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, String]
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        // the last stage's name carries the action's call site; its
        // details field holds the full stack — grab the first graft frame
        val stages = js.stageInfos
        val site = stages.map(s => s"${s.name.takeWhile(_ != '$')}(${s.numTasks}t)").mkString("; ")
        val graftFrame = stages.flatMap(_.details.linesIterator)
          .find(l => l.contains("graft.") && !l.contains("GraftSession") && !l.contains("graft.tools"))
          .map(_.trim).getOrElse("")
        starts.put(js.jobId, js.time)
        jobs.put(js.jobId, f"  job ${js.jobId}%3d  ${stages.size}%2d stages  %%7.2fs  $site  $graftFrame")
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val dt = (je.time - starts.getOrDefault(je.jobId, je.time)) / 1e3
        jobs.computeIfPresent(je.jobId, (_, s) => s.format(dt))
      }
    })
    // in-process sampling profiler (PROFILE_SAMPLES=1): every 50ms,
    // histogram the top graft/catalyst frame of every runnable thread —
    // attributes driver-side wall (analysis, codegen, scheduling) that
    // job times can't see
    val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]
    @volatile var sampling = sys.env.contains("PROFILE_SAMPLES")
    val sampler = new Thread(() => {
      while (sampling) {
        val all = Thread.getAllStackTraces
        all.forEach { (t, st) =>
          if (t.getState == Thread.State.RUNNABLE && st.nonEmpty) {
            val interesting = st.find { f =>
              val c = f.getClassName
              c.startsWith("graft.") ||
                c.startsWith("org.apache.spark.sql.catalyst.analysis") ||
                c.startsWith("org.apache.spark.sql.catalyst.optimizer") ||
                c.startsWith("org.apache.spark.sql.catalyst.plans") ||
                c.startsWith("org.apache.spark.sql.catalyst.trees") ||
                c.startsWith("org.apache.spark.sql.execution") ||
                c.startsWith("org.codehaus.janino")
            }
            interesting.foreach { f =>
              val key = s"${f.getClassName.split('.').takeRight(2).mkString(".")}.${f.getMethodName}"
              hist.merge(key, 1, (a, b) => a + b)
            }
          }
        }
        Thread.sleep(50)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    // PROFILE_WARM=1: run once untimed (JIT + codegen), clear caches, then
    // profile the warm rerun — the bench artifact's headline condition
    if (sys.env.contains("PROFILE_WARM")) {
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      spark.catalog.clearCache()
      Thread.sleep(500)
      jobs.clear(); starts.clear(); hist.clear()
    }
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
    val dt = (System.nanoTime() - t0) / 1e9
    sampling = false
    if (sys.env.contains("PROFILE_SAMPLES")) {
      import scala.jdk.CollectionConverters._
      println("--- driver/executor RUNNABLE samples (50ms) ---")
      hist.asScala.toSeq.sortBy(-_._2.intValue).take(25)
        .foreach { case (k, v) => println(f"  $v%5d  $k") }
    }
    Thread.sleep(500) // listener events are posted asynchronously
    println(f"$name: $dt%.2f s, $n rows, ${jobs.size} jobs")
    import scala.jdk.CollectionConverters._
    jobs.asScala.toSeq.sortBy(_._1).foreach(e => println(e._2))
    spark.stop()
  }
}
