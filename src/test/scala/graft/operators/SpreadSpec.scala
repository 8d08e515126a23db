package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The scale-adaptive entry spread: round-robin repartition fires only
  * in the latency regime (input smaller than cores × maxPartitionBytes,
  * where the scan cannot feed every core); bigger inputs keep their
  * natural split layout — the unconditional form used to shuffle the
  * whole payload at any scale. */
class SpreadSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def isSpread(df: org.apache.spark.sql.DataFrame): Boolean =
    Spread.scan(df).queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.catalyst.plans.logical.Repartition => r
    }.nonEmpty

  test("fires on a small scan (latency regime)") {
    assert(isSpread(spark.range(1000).toDF("id")))
  }

  test("keeps the natural layout once the scan already feeds every core") {
    val key = "spark.sql.files.maxPartitionBytes"
    val prior = spark.conf.get(key, "134217728")
    spark.conf.set(key, "1") // threshold = cores × 1 byte
    try assert(!isSpread(spark.range(1000).toDF("id")))
    finally spark.conf.set(key, prior)
  }

  test("spread output fans the parallelism out to every core") {
    val n = Spread.scan(spark.range(1000).toDF("id")).rdd.getNumPartitions
    assert(n === spark.sparkContext.defaultParallelism)
  }

  test("streaming frames keep the unconditional spread (no batch-stats probe)") {
    // batch statistics are undefined on a streaming source — probing them
    // throws; the streaming near-dup operators must keep working
    val stream = spark.readStream.format("rate").load().toDF("ts", "value")
    val spread = Spread.scan(stream)
    assert(spread.isStreaming)
    assert(spread.queryExecution.logical.collect {
      case r: org.apache.spark.sql.catalyst.plans.logical.Repartition => r
    }.nonEmpty)
  }
}
