package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[EventWindows.rolling]] (point-in-time trailing features) and
  * [[TextAnalysis.tfIdfTopTerms]]: equivalence to the naive quadratic
  * definitions, frame-edge semantics, and rank/score contracts. */
class EventWindowsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("rolling == naive trailing self-join on real events (sf0.001)") {
    val ev = graft.Tables(spark, "/root/testdata/sf0.001", "events")
    val win = 3600L * 1000000L
    val fast = EventWindows.rolling(ev, "ts", "user_id", "value", win)
      .select(col("event_id"), col("n_trailing"),
        round(col("sum_trailing"), 6).as("s"))
    val r = ev.select(col("user_id").as("r_user"),
      unix_micros(col("ts")).as("r_us"), col("value").as("r_value"))
    val slow = ev.select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      .join(r, col("user_id") === col("r_user") &&
        col("r_us") >= col("us") - win && col("r_us") <= col("us"))
      .groupBy("event_id")
      .agg(count(lit(1)).as("n_trailing"),
        round(graft.functions.dsum(col("r_value")), 6).as("s"))
    assert(fast.count() === ev.count())
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
  }

  test("rolling RANGE frame: equal-timestamp peers all count, window edge is inclusive") {
    val t0 = ts("2024-01-01 10:00:00")
    val rows = Seq(
      (1L, 1L, ts("2024-01-01 09:00:00"), 1.0), // exactly windowUs before t0
      (2L, 1L, t0, 10.0),
      (3L, 1L, t0, 100.0), // equal-ts peer
      (4L, 1L, ts("2024-01-01 10:30:00"), 1000.0),
      (5L, 2L, t0, 7.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val out = EventWindows.rolling(rows, "ts", "user_id", "value",
        3600L * 1000000L)
      .select("event_id", "n_trailing", "sum_trailing")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L) === ((1L, 1.0)))
    // both t0 rows see: the 1h-old edge row (inclusive) + BOTH t0 peers
    assert(out(2L) === ((3L, 111.0)))
    assert(out(3L) === ((3L, 111.0)))
    // 10:30 sees everything of user 1 except nothing dropped (9:30 cut:
    // the 09:00 row is now outside the 1h window)
    assert(out(4L) === ((3L, 1110.0)))
    assert(out(5L) === ((1L, 7.0)))
  }

  test("rolling: null-ts rows get NULL features, never fabricated ones, " +
    "and never pollute timestamped rows' frames") {
    val t0 = ts("2024-01-01 10:00:00")
    val rows = Seq(
      (1L, 1L, Option(t0), 10.0),
      (2L, 1L, Option.empty[java.sql.Timestamp], 5.0), // malformed
      (3L, 1L, Option.empty[java.sql.Timestamp], 7.0)  // malformed peer
    ).toDF("event_id", "user_id", "ts", "value")
    val out = EventWindows.rolling(rows, "ts", "user_id", "value",
        3600L * 1000000L).collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(4)), Option(r.get(5)))).toMap
    // the timestamped row sees only itself
    assert(out(1L) === ((Some(1L), Some(10.0))))
    // the two null-ts peers must NOT count each other
    assert(out(2L) === ((None, None)))
    assert(out(3L) === ((None, None)))
  }

  test("rolling plan: one exchange, no join") {
    val ev = graft.Tables(spark, "/root/testdata/sf0.001", "events")
    val plan = EventWindows.rolling(ev, "ts", "user_id", "value", 3600L * 1000000L)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size === 1, plan)
    assert(!plan.contains("Join"), plan)
  }

  test("tfIdfTopTerms: rank contract, score order, blank docs absent") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val out = TextAnalysis.tfIdfTopTerms(docs, "doc_id", "text", k = 3)
    val byDoc = out.collect().groupBy(_.getLong(0))
    assert(byDoc.nonEmpty)
    for ((_, rows) <- byDoc) {
      val sorted = rows.sortBy(_.getInt(4))
      assert(sorted.map(_.getInt(4)).toSeq == (1 to sorted.size))
      assert(sorted.size <= 3)
      // scores non-increasing with rank
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a.getDouble(3) >= b.getDouble(3)
        case _ => true
      })
    }
  }

  test("tfIdfTopTerms: corpus-universal terms score 0, rare terms rank first") {
    val docs = Seq(
      (1L, "common rare1 common"),
      (2L, "common rare2"),
      (3L, "common rare2 rare2")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfIdfTopTerms(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(4)) ->
        (r.getString(1), r.getDouble(3))).toMap
    // df(common)=3 -> idf = ln(4/4) = 0; rare terms dominate
    assert(out((1L, 1))._1 == "rare1" && out((1L, 1))._2 > 0)
    assert(out((1L, 2)) == (("common", 0.0)))
    assert(out((3L, 1))._1 == "rare2")
    // tf=2 for doc 3's rare2 vs tf=1 for doc 2's -> double the score
    assert(out((3L, 1))._2 == 2 * out((2L, 1))._2)
  }
}
