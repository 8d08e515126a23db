package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Scale-growth smoke for the full reference DAG (the q46 shape): runs
  * `summary_indicators.yml` — 11 recipe evaluations over 3 layers — on
  * fixture trees whose LOG LINE counts grow `mult`× (file/recipe layout
  * fixed, logs longer; see [[graft.corpus.ReferenceCorpus.ensure]]).
  * That is the growth regime the DAG lives in at 100 TB: the recipe
  * tree is organizational (dozens of nodes), the data under it scales.
  *
  * A scale-safe DAG must grow ~linearly in wall time with roughly
  * CONSTANT Spark job count: jobs measure coordination (inference
  * aggregates, ratio collects, cache fills — all per-recipe, not
  * per-row), so a job count that grows with `mult` would mean the
  * engine is issuing data-sized driver work.
  *
  * Usage: scripts/run.sh graft.tools.DagScale [sfDir] [mults...]
  */
object DagScale {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mults = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 4, 16)

    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    })

    def fixtureBytes(root: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum else f.length()
      walk(new java.io.File(root))
    }

    // the listener bus is asynchronous: poll until the count is stable
    // before reading/resetting, or late job-start events under-count a
    // row and bleed into the next (JobBudgetSpec's stability pattern)
    def drainedJobs(): Int = {
      var prev = -1
      var stable = 0
      var rounds = 0
      while (stable < 3 && rounds < 100) {
        Thread.sleep(100)
        val c = jobs.get()
        if (c == prev) stable += 1 else { stable = 0; prev = c }
        rounds += 1
      }
      jobs.get()
    }

    def runDag(root: String): (Double, Long, Int) = {
      val bench = graft.recipe.Benchmark(spark, s"$root/summary_indicators.yml")
      val t0 = System.nanoTime()
      val rows = bench.getAggregatedData().count()
      val wall = (System.nanoTime() - t0) / 1e9
      bench.unpersist()
      (wall, rows, drainedJobs())
    }

    // unrecorded warmup: first DAG execution pays whole-stage-codegen
    // JIT for every operator shape; the measured points then compare
    // plan cost, not compiler cost
    runDag(graft.corpus.ReferenceCorpus.ensure(spark, sfDir, 1))

    // min-of-N passes per mult (default 2, DAGSCALE_PASSES overrides):
    // single draws on this co-tenant host drift up to 2x between runs —
    // the same lesson the bench artifact learned (BENCH noise canary);
    // the min compares plan cost, not window luck. Jobs from the min
    // pass (they are stable across passes by construction).
    val passes = sys.env.getOrElse("DAGSCALE_PASSES", "2").toInt
    println(f"${"mult"}%-6s${"fixtureMB"}%-11s${"rows"}%-7s${"jobs"}%-6s${"wall_s"}%-8s")
    for (m <- mults) {
      val root = graft.corpus.ReferenceCorpus.ensure(spark, sfDir, m)
      val mb = fixtureBytes(root) / 1e6
      val results = (1 to passes).map { _ =>
        drainedJobs() // settle any still-queued events before the reset
        jobs.set(0)
        runDag(root)
      }
      val (wall, rows, nJobs) = results.minBy(_._1)
      println(f"$m%-6d$mb%-11.1f$rows%-7d$nJobs%-6d$wall%-8.2f")
    }
    spark.stop()
  }
}
