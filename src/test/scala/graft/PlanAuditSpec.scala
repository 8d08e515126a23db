package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality regressions: these properties are what make the same
  * code scale to a real cluster — assert them so a refactor can't
  * silently trade them away. */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("filters push into the parquet scan (q05)") {
    val p = plan("q05_filter_in")
    assert(p.contains("PushedFilters") && p.contains("In(o_orderstatus"))
  }

  test("fact-dim join broadcasts the dimension side (q14)") {
    assert(plan("q14_join_agg").contains("BroadcastHashJoin"))
  }

  test("column pruning reaches the scan (q01 reads only needed columns)") {
    // the plan string truncates long schemas; pruned parquet schemas keep
    // file order, so unread leading columns (l_orderkey, l_partkey) would
    // be visible at the front if pruning failed
    val p = plan("q01_group_agg")
    val schema = "ReadSchema: struct<([^\n]*)".r.findFirstMatchIn(p).map(_.group(1))
    assert(schema.isDefined)
    assert(schema.get.startsWith("l_quantity"))
    assert(!schema.get.contains("l_partkey") && !schema.get.contains("l_orderkey"))
  }

  test("aggregation is partial (map-side combine) before the shuffle (q01)") {
    // two HashAggregate operators = partial + final
    assert("HashAggregate".r.findAllIn(plan("q01_group_agg")).length >= 2)
  }

  test("ANN brute force streams the corpus against a broadcast query side (q24)") {
    val p = plan("q24_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("graft_cosine")) // native expression in the plan
  }

  test("sessionization shuffles once on the session key (q29)") {
    val p = plan("q29_sessions")
    assert("hashpartitioning\\(user_id".r.findAllIn(p).nonEmpty)
  }
}
