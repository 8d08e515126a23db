package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[Joins.asofJoin]] / [[Joins.rangeJoin]]: semantics against the naive
  * (quadratic) definition on real data, hand-built edge fixtures, and the
  * plan shapes that make them scale — one exchange for the sweep, an
  * equi-join (never a nested loop) for the bucketized range join. */
class JoinsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // hand fixture: user 1 has clicks at :00, :10, :10 (tie), :30;
  // user 2 has none; a null-user click and a null-ts click must be inert
  private lazy val clicks = Seq(
    (Some(1L), Some(ts("2024-01-01 10:00:00")), 100L, 1.0),
    (Some(1L), Some(ts("2024-01-01 10:10:00")), 101L, 2.0),
    (Some(1L), Some(ts("2024-01-01 10:10:00")), 102L, 3.0), // tie: max id wins
    (Some(1L), Some(ts("2024-01-01 10:30:00")), 103L, 4.0),
    (None,     Some(ts("2024-01-01 10:00:00")), 104L, 5.0),
    (Some(1L), None,                            105L, 6.0)
  ).toDF("user_id", "ts", "event_id", "value")

  private lazy val buys = Seq(
    (Some(1L), Some(ts("2024-01-01 10:05:00")), 200L), // -> click 100
    (Some(1L), Some(ts("2024-01-01 10:10:00")), 201L), // AT tie ts -> 102
    (Some(1L), Some(ts("2024-01-01 10:29:59")), 202L), // -> 102 (101/102 tie, max)
    (Some(1L), Some(ts("2024-01-01 09:59:00")), 203L), // before all -> null
    (Some(2L), Some(ts("2024-01-01 10:20:00")), 204L), // keyless user -> null
    (None,     Some(ts("2024-01-01 10:20:00")), 205L), // null key -> null
    (Some(1L), None,                            206L)  // null ts  -> null
  ).toDF("user_id", "ts", "event_id")

  test("asofJoin hand fixture: <= match, max-tie at equal ts, null edges") {
    val out = Joins.asofJoin(buys, clicks, Seq("user_id"), "ts", "ts",
      payload = Seq("event_id", "value"), tieCol = "event_id")
      .select("event_id", "asof_event_id", "asof_value")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2))).toSet
    assert(out === Set(
      (200L, 100L, 1.0), (201L, 102L, 3.0), (202L, 102L, 3.0),
      (203L, -1L, -1.0), (204L, -1L, -1.0), (205L, -1L, -1.0),
      (206L, -1L, -1.0)))
    // row count preserved: left-outer semantics
    assert(Joins.asofJoin(buys, clicks, Seq("user_id"), "ts", "ts",
      Seq("value"), "event_id").count() === buys.count())
  }

  test("asofJoin tolerance nulls the whole attachment, not single columns") {
    val out = Joins.asofJoin(buys, clicks, Seq("user_id"), "ts", "ts",
      payload = Seq("event_id", "value"), tieCol = "event_id",
      toleranceUs = Some(60L * 1000000L)) // 1 minute
      .select("event_id", "asof_event_id", "asof_value", "asof_ts")
      .collect().map(r => r.getLong(0) ->
        Seq(r.isNullAt(1), r.isNullAt(2), r.isNullAt(3))).toMap
    // 200 matched 5 min ago -> out of tolerance; 201 matched at 0s -> in
    assert(out(200L) === Seq(true, true, true))
    assert(out(201L) === Seq(false, false, false))
    assert(out(202L) === Seq(true, true, true)) // ~20 min stale
  }

  /** the naive definition: keyed theta-join, argmax by (ts, tie) */
  private def naiveAsof(left: DataFrame, right: DataFrame): DataFrame = {
    val r = right.select(col("user_id").as("r_user"), col("ts").as("r_ts"),
      col("event_id").as("r_id"), col("value").as("r_value"))
    val w = Window.partitionBy("event_id")
      .orderBy(col("r_ts").desc, col("r_id").desc)
    left.join(r, col("user_id") === col("r_user") && col("r_ts") <= col("ts"), "left")
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("event_id"), col("r_id").as("asof_event_id"),
        col("r_value").as("asof_value"))
  }

  test("asofJoin == naive keyed theta-join + argmax on real events (sf0.001)") {
    val ev = graft.Tables(spark, "/root/testdata/sf0.001", "events")
    val l = ev.filter(col("event_type") === "purchase")
      .select("event_id", "ts", "user_id", "value")
    val r = ev.filter(col("event_type") === "click")
    val fast = Joins.asofJoin(l, r, Seq("user_id"), "ts", "ts",
        Seq("event_id", "value"), "event_id")
      .select("event_id", "asof_event_id", "asof_value")
    val slow = naiveAsof(l, r)
    assert(fast.count() === l.count())
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
  }

  test("asofJoin plan: ONE exchange (the key shuffle), no joins at all") {
    val ev = graft.Tables(spark, "/root/testdata/sf0.001", "events")
    val plan = Joins.asofJoin(
      ev.filter(col("event_type") === "purchase")
        .select("event_id", "ts", "user_id", "value"),
      ev.filter(col("event_type") === "click"),
      Seq("user_id"), "ts", "ts", Seq("event_id", "value"), "event_id")
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size === 1, plan)
    assert(!plan.contains("Join"), plan)
  }

  test("asofJoinStatic == asofJoin on the hand fixture (all edges) and real events") {
    def both(tol: Option[Long]) = (
      Joins.asofJoin(buys, clicks, Seq("user_id"), "ts", "ts",
        Seq("event_id", "value"), "event_id", toleranceUs = tol),
      Joins.asofJoinStatic(buys, clicks, Seq("user_id"), "ts", "ts",
        Seq("event_id", "value"), "event_id", toleranceUs = tol))
    for (tol <- Seq(None, Some(60L * 1000000L))) {
      val (sweep, static) = both(tol)
      assert(static.columns.toSeq == sweep.columns.toSeq)
      assert(static.exceptAll(sweep).isEmpty && sweep.exceptAll(static).isEmpty,
        s"tol=$tol")
    }
    val ev = graft.Tables(spark, "/root/testdata/sf0.001", "events")
    val l = ev.filter(col("event_type") === "purchase")
      .select("event_id", "ts", "user_id", "value")
    val r = ev.filter(col("event_type") === "click")
    val sweep = Joins.asofJoin(l, r, Seq("user_id"), "ts", "ts",
      Seq("event_id", "value"), "event_id")
    val static = Joins.asofJoinStatic(l, r, Seq("user_id"), "ts", "ts",
      Seq("event_id", "value"), "event_id")
    assert(static.exceptAll(sweep).isEmpty && sweep.exceptAll(static).isEmpty)
  }

  test("asofJoinStatic errors LOUDLY on a key exceeding the per-key " +
    "right-side cap instead of building a giant array row") {
    val hotRight = spark.range(0, 50)
      .select(lit(1L).as("user_id"), // one hot key, 50 rows
        expr("timestamp_micros(id * 1000000)").as("ts"),
        col("id").as("event_id"), lit(1.0).as("value"))
    val l = Seq((100L, ts("2024-01-01 00:00:01"), 1L, 5.0))
      .toDF("event_id", "ts", "user_id", "value")
    val err = intercept[Exception] {
      Joins.asofJoinStatic(l, hotRight, Seq("user_id"), "ts", "ts",
        Seq("event_id", "value"), "event_id",
        maxRightRowsPerKey = 10).collect()
    }
    assert(err.getMessage.contains("asofJoinStatic") &&
      err.getMessage.contains("BOUNDED"), err.getMessage)
    // the same data passes once the cap accommodates the key
    assert(Joins.asofJoinStatic(l, hotRight, Seq("user_id"), "ts", "ts",
      Seq("event_id", "value"), "event_id",
      maxRightRowsPerKey = 50).count() === 1)
  }

  test("rangeJoin == plain range predicate on real events (sf0.001)") {
    val ev = graft.Tables(spark, "/root/testdata/sf0.001", "events")
    val win = 600L * 1000000L
    val errs = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("ts").as("win_start"),
        timestamp_micros(unix_micros(col("ts")) + win).as("win_end"))
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("buy_id"), col("ts").as("buy_ts"))
    val fast = Joins.rangeJoin(buys, "buy_ts", errs, "win_start", "win_end", win)
      .select("err_id", "buy_id")
    val slow = buys.crossJoin(errs)
      .filter(col("buy_ts") >= col("win_start") && col("buy_ts") <= col("win_end"))
      .select("err_id", "buy_id")
    assert(fast.count() > 0)
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
  }

  test("rangeJoin bucket width does not change results (2x finer/coarser)") {
    val ev = graft.Tables(spark, "/root/testdata/sf0.001", "events")
    val win = 600L * 1000000L
    val errs = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("ts").as("win_start"),
        timestamp_micros(unix_micros(col("ts")) + win).as("win_end"))
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("buy_id"), col("ts").as("buy_ts"))
    def run(w: Long) = Joins.rangeJoin(buys, "buy_ts", errs,
      "win_start", "win_end", w).select("err_id", "buy_id")
    val base = run(win)
    for (w <- Seq(win / 2, win * 2)) {
      val alt = run(w)
      assert(alt.exceptAll(base).isEmpty && base.exceptAll(alt).isEmpty, s"w=$w")
    }
  }

  test("rangeJoin plan: shuffled equi-join on the bucket, never a nested loop") {
    val ev = graft.Tables(spark, "/root/testdata/sf0.001", "events")
    val win = 600L * 1000000L
    val errs = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("ts").as("win_start"),
        timestamp_micros(unix_micros(col("ts")) + win).as("win_end"))
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("buy_id"), col("ts").as("buy_ts"))
    val plan = Joins.rangeJoin(buys, "buy_ts", errs, "win_start", "win_end", win)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"), plan)
    assert(plan.contains("__bkt"), plan)
  }

  test("rangeJoin rejects an interval wider than the replication cap") {
    val iv = Seq((1L, ts("2024-01-01 00:00:00"), ts("2024-06-01 00:00:00")))
      .toDF("id", "s", "e")
    val pt = Seq((10L, ts("2024-01-15 00:00:00"))).toDF("pid", "p")
    val err = intercept[Exception] {
      Joins.rangeJoin(pt, "p", iv, "s", "e", 1000000L,
        maxBucketsPerInterval = 1000).collect()
    }
    assert(err.getMessage.contains("rangeJoin"), err.getMessage)
    // and the same interval passes with a cap that accommodates it
    assert(Joins.rangeJoin(pt, "p", iv, "s", "e",
      86400L * 1000000L).count() === 1)
  }

  test("rangeJoin: inverted and null intervals never match, null points drop") {
    val iv = Seq(
      (1L, Some(ts("2024-01-01 10:00:00")), Some(ts("2024-01-01 09:00:00"))), // inverted
      (2L, None, Some(ts("2024-01-01 11:00:00"))),
      (3L, Some(ts("2024-01-01 10:00:00")), Some(ts("2024-01-01 11:00:00")))
    ).toDF("id", "s", "e")
    val pt = Seq((10L, Some(ts("2024-01-01 10:30:00"))), (11L, None))
      .toDF("pid", "p")
    val out = Joins.rangeJoin(pt, "p", iv, "s", "e", 600L * 1000000L)
      .select("id", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((3L, 10L)))
  }
}
