package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[Profiling]]: exact heavy hitters (Misra-Gries candidates +
  * broadcast-confirmed counts must EQUAL the plain groupBy answer on
  * every partition layout) and the per-group KMV distinct aggregate
  * (exact below k, bounded error above, groupBy-identical across
  * layouts). */
class ProfilingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val docs =
    graft.Tables(spark, "/root/testdata/sf0.001", "documents")

  private lazy val toks = docs
    .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
    .filter(col("tok") =!= "")

  /** The definitional answer: plain exact groupBy + ceil threshold. */
  private def naive(phi: Double): Set[(String, Long)] = {
    val n = toks.count()
    val t = math.ceil(phi * n).toLong
    toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= t)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
  }

  private def hh(df: org.apache.spark.sql.DataFrame, phi: Double): Set[(String, Long)] =
    Profiling.heavyHitters(df, col("tok"), phi)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

  test("heavyHitters == exact groupBy answer, partition-layout-independent") {
    for (phi <- Seq(0.002, 0.01, 0.05)) {
      val want = naive(phi)
      assert(hh(toks, phi) == want, s"phi=$phi")
      assert(hh(toks.repartition(1), phi) == want, s"phi=$phi single partition")
      assert(hh(toks.repartition(17), phi) == want, s"phi=$phi 17 partitions")
    }
  }

  test("heavyHitters: threshold edges, nulls skipped, degenerate phi=1") {
    val spark2 = spark
    import spark2.implicits._
    // 10 rows: "a"x5, "b"x3, "c"x2 — phi=0.3 keeps a(5) and b(3)=ceil(3.0)
    val items = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c"))
      .toDF("tok")
    assert(hh(items, 0.3) == Set(("a", 5L), ("b", 3L)))
    // exactly-at-threshold: phi=0.2 -> t=2, c(2) included
    assert(hh(items, 0.2) == Set(("a", 5L), ("b", 3L), ("c", 2L)))
    // nulls are not items and don't count toward N: 5 nulls + a,a,b ->
    // N=3, phi=0.5 -> t=2 -> only a
    val withNulls = (Seq("a", "a", "b").map(Option(_)) ++
      Seq.fill(5)(Option.empty[String])).toDF("tok")
    assert(hh(withNulls, 0.5) == Set(("a", 2L)))
    // phi=1: only a value owning EVERY row qualifies
    assert(hh(items, 1.0) == Set.empty)
    assert(hh(Seq("x", "x").toDF("tok"), 1.0) == Set(("x", 2L)))
  }

  test("heavyHitters plan: broadcast confirm join, no sort-merge") {
    val p = Profiling.heavyHitters(toks, col("tok"), 0.01)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  private lazy val langShingles = docs.select(col("lang"),
    explode(TextAnalysis.wordShingles(col("text"), 3)).as("sh"))

  test("distinctByGroup: exact below k, within 2/sqrt(k) above, " +
    "partition-invariant") {
    val exact = langShingles.select("lang", "sh").distinct()
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // k far above any group's distinct count: EXACT for every group
    val big = Profiling.distinctByGroup(langShingles, Seq(col("lang")),
        col("sh"), sketchK = 1 << 20)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(big == exact.map { case (l, n) => l -> n.toDouble })
    // estimating k: every group's estimate within the 2/sqrt(k) bound
    val k = 256
    val est = Profiling.distinctByGroup(langShingles, Seq(col("lang")),
        col("sh"), sketchK = k)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    for ((l, n) <- exact if n > k)
      assert(math.abs(est(l) - n) / n <= 2.0 / math.sqrt(k),
        s"lang=$l est=${est(l)} exact=$n")
    for ((l, n) <- exact if n < k) assert(est(l) == n.toDouble)
    // bounded-buffer merge is layout-independent
    val one = Profiling.distinctByGroup(langShingles.repartition(1),
      Seq(col("lang")), col("sh"), k).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val many = Profiling.distinctByGroup(langShingles.repartition(13),
      Seq(col("lang")), col("sh"), k).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(one == many && one == est)
  }

  test("graft_kmv_distinct: all-null group reports 0, partial agg in plan") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(("g1", Some("x")), ("g1", Some("y")), ("g2", None))
      .toDF("g", "v")
    val out = Profiling.distinctByGroup(df, Seq(col("g")), col("v"), 16)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("g1" -> 2.0, "g2" -> 0.0))
    // map-side combine applies (partial_ aggregate mode in the plan)
    val p = Profiling.distinctByGroup(langShingles, Seq(col("lang")),
      col("sh"), 64).queryExecution.executedPlan.toString
    assert(p.contains("partial_graft_kmv_distinct"), p)
  }
}
