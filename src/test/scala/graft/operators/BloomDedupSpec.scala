package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Bloom-prefiltered exact incremental dedup: row-identical to the plain
  * anti-join at any filter sizing, no false negatives at the probe, and a
  * probe plan that never shuffles either side. */
class BloomDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val docs =
    graft.Tables(spark, TestSpark.sfDir, "documents")
      .withColumn("__k", substring(col("text"), 1, 40))
  private lazy val batch = docs.filter(col("doc_id") % 5 === 0)
  private lazy val history = docs.filter(col("doc_id") % 5 =!= 0)

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  private lazy val plainAnti =
    ids(batch.join(history.select("__k"), Seq("__k"), "left_anti"))

  test("bloomDedup == plain anti-join on the documents fixture") {
    val got = ids(Dedup.bloomDedup(batch, history, "__k"))
    assert(got == plainAnti)
    assert(got.nonEmpty && got.size < batch.count()) // both paths exercised
  }

  test("result is identical under a degenerate 64-bit filter (sizing is " +
    "a cost knob, never a correctness one)") {
    // ~all batch keys collide into might-contain=true -> the exact
    // confirm pass does all the work; result must not change
    val tiny = Dedup.bloomDedup(batch, history, "__k",
      expectedItems = 4L, numBits = 64L)
    assert(ids(tiny) == plainAnti)
  }

  test("probe has no false negatives: every skipped key is truly absent") {
    val bloom = Dedup.bloomBuild(history, "__k")
    val skipped = batch.filter(!Dedup.bloomMightContain(bloom, col("__k")))
    val wrong = skipped.join(history.select("__k"), Seq("__k"), "left_semi")
    assert(wrong.isEmpty)
  }

  test("empty history (the first-ever increment) keeps the whole batch; " +
    "empty batch yields an empty result") {
    import spark.implicits._
    val noHistory = Seq.empty[(Long, String)].toDF("doc_id", "__k")
    assert(Dedup.bloomBuild(noHistory, "__k") == null)
    val kept = Dedup.bloomDedup(batch.select("doc_id", "__k"), noHistory, "__k")
    assert(kept.count() == batch.count())
    val noBatch = Seq.empty[(Long, String)].toDF("doc_id", "__k")
    assert(Dedup.bloomDedup(noBatch, history, "__k").isEmpty)
  }

  test("probe plan never shuffles batch or history rows: broadcast joins " +
    "plus exactly one distinct-dup-key exchange (map-side combined)") {
    val bloom = Dedup.bloomBuild(history, "__k")
    val p = Dedup.bloomDedupWith(batch, history, "__k", bloom)
      .queryExecution.executedPlan.toString
    // the ONE exchange is the dupKeys distinct — its map-side partial
    // HashAggregate means the wire carries distinct duplicate keys, not
    // history rows (the raw semi-join output is one row per matching
    // history row, which must never be the broadcast payload)
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p)
    assert(!p.contains("Exchange rangepartitioning"), p)
    assert(p.contains("HashAggregate"), p) // the distinct's partial agg
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert("BroadcastHashJoin".r.findAllIn(p).length == 2, p)
  }

  test("mostly-duplicate batch above the broadcast cap takes the shuffle " +
    "fallback and stays row-identical") {
    val bloom = Dedup.bloomBuild(history, "__k")
    // broadcastMaxKeys=1 forces the fallback on any non-trivial batch
    val fb = Dedup.bloomDedupWith(batch, history, "__k", bloom,
      broadcastMaxKeys = 1L)
    assert(ids(fb) == plainAnti)
    val p = fb.queryExecution.executedPlan.toString
    // the fallback's shape: bloom-cleared rows bypass the join via the
    // Union; the candidate slice anti-joins history WITHOUT the
    // driver-side broadcast(dupKeys) collect (at sf-test scale AQE may
    // still choose a broadcast for the join itself — that's its runtime
    // call, not a driver-materialized candidate set)
    assert(p.contains("Union"), p)
    assert(p.contains("LeftAnti"), p)
  }

  test("null keys are kept on both paths (a null never equals an " +
    "anti-join key)") {
    import spark.implicits._
    val b = Seq((1L, "a"), (2L, null), (3L, "zzz")).toDF("doc_id", "__k")
    val h = Seq((10L, "a"), (11L, "b")).toDF("doc_id", "__k")
    val bloom = Dedup.bloomBuild(h, "__k")
    val expect = ids(b.join(h.select("__k"), Seq("__k"), "left_anti"))
    assert(expect == Set(2L, 3L)) // sanity: null-key row is a keep
    assert(ids(Dedup.bloomDedupWith(b, h, "__k", bloom)) == expect)
    assert(ids(Dedup.bloomDedupWith(b, h, "__k", bloom,
      broadcastMaxKeys = 0L)) == expect)
  }
}
