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

  test("keySkew == plain-Scala concentration stats; edges behave") {
    val spark2 = spark
    import spark2.implicits._
    val ev = graft.Tables(spark, "/root/testdata/sf0.001", "events")
    val counts = ev.filter(col("user_id").isNotNull)
      .groupBy("user_id").count().collect()
      .map(r => String.valueOf(r.get(0)) -> r.getLong(1))
    val n = counts.map(_._2).sum
    val top10 = counts.sortBy { case (k, c) => (-c, k) }.take(10).map(_._2).sum
    val p2 = counts.map { case (_, c) => c * (c - 1) }.sum
    val row = Profiling.keySkew(ev, col("user_id")).head()
    assert(row.getLong(0) == n && row.getLong(1) == counts.length)
    assert(row.getLong(2) == counts.map(_._2).max)
    assert(row.getDouble(3) == counts.map(_._2).max.toDouble / n)
    assert(row.getDouble(4) == top10.toDouble / n)
    assert(row.getDouble(5) == p2.toDouble / (n.toDouble * (n.toDouble - 1)))
    // layout-independent
    assert(Profiling.keySkew(ev.repartition(13), col("user_id")).head() == row)
    // all-same key: every share 1.0, collision certainty
    val same = Seq.fill(5)("x").toDF("k")
    val s = Profiling.keySkew(same, col("k")).head()
    assert(s.getDouble(3) == 1.0 && s.getDouble(4) == 1.0 && s.getDouble(5) == 1.0)
    // single row: the n_rows > 1 guard keeps collision_prob defined
    val one = Profiling.keySkew(Seq("x").toDF("k"), col("k")).head()
    assert(one.getDouble(5) == 0.0 && one.getDouble(3) == 1.0)
    // nulls are not keys
    val withNull = Profiling.keySkew(
      Seq(Some("a"), Some("a"), None).toDF("k"), col("k")).head()
    assert(withNull.getLong(0) == 2 && withNull.getDouble(3) == 1.0)
  }

  test("binnedQuantiles: within one bin width of the exact percentile, " +
    "monotone, layout-invariant, clamped") {
    val ev = docs.select(col("n_chars"))
    val (lo, hi, bins) = (0L, 1024L, 64)
    val w = (hi - lo).toDouble / bins
    val qs = Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0)
    val est = Profiling.binnedQuantiles(ev, col("n_chars"), lo, hi, bins, qs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val exact = docs.selectExpr(
        s"percentile(n_chars, array(${qs.mkString(",")})) AS p")
      .head().getSeq[Double](0)
    for ((q, e) <- qs.zip(exact)) {
      assert(math.abs(est(q) - e) <= w, s"q=$q est=${est(q)} exact=$e")
      assert(est(q) >= lo && est(q) <= hi)
    }
    // monotone in q
    val ordered = qs.map(est)
    assert(ordered == ordered.sorted)
    // exact integer histogram => layout-invariant
    val many = Profiling.binnedQuantiles(ev.repartition(13), col("n_chars"),
        lo, hi, bins, qs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(many == est)
    // out-of-range values clamp to the edge bins, never escape [lo, hi]
    val spark2 = spark
    import spark2.implicits._
    val wild = Seq(-500L, -1L, 0L, 5000L, 9999L).toDF("v")
    val c = Profiling.binnedQuantiles(wild, col("v"), lo, hi, bins,
        Seq(0.0, 1.0))
      .collect().map(_.getDouble(1))
    assert(c.forall(x => x >= lo && x <= hi))
  }

  test("binnedQuantilesByGroup: every (group, q) within one bin width of " +
    "that group's exact percentile; window is group-partitioned") {
    val (lo, hi, bins) = (0L, 1024L, 64)
    val w = (hi - lo).toDouble / bins
    val qs = Seq(0.1, 0.5, 0.9)
    val got = Profiling.binnedQuantilesByGroup(docs, col("lang"),
        col("n_chars"), lo, hi, bins, qs)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    val exact = docs.groupBy("lang")
      .agg(expr(s"percentile(n_chars, array(${qs.mkString(",")}))").as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(got.keySet == exact.keySet.flatMap(g => qs.map(g -> _)))
    for ((g, ps) <- exact; (q, e) <- qs.zip(ps))
      assert(math.abs(got((g, q)) - e) <= w, s"g=$g q=$q got=${got((g, q))} e=$e")
    // the cumulative window must be partitioned by group (no global sort)
    val p = Profiling.binnedQuantilesByGroup(docs, col("lang"),
        col("n_chars"), lo, hi, bins, qs)
      .queryExecution.executedPlan.toString
    assert("hashpartitioning\\(g".r.findAllIn(p).nonEmpty, p)
    // each group's answer matches running the GLOBAL operator on its slice
    val langs = docs.select("lang").distinct().collect().map(_.getString(0))
    for (g <- langs.take(2)) {
      val solo = Profiling.binnedQuantiles(docs.filter(col("lang") === g),
          col("n_chars"), lo, hi, bins, qs)
        .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
      for (q <- qs) assert(got((g, q)) == solo(q), s"g=$g q=$q")
    }
  }

  test("keySkew plan: TakeOrdered top-10, never a global sort") {
    val ev = graft.Tables(spark, "/root/testdata/sf0.001", "events")
    val p = Profiling.keySkew(ev, col("user_id"))
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
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

  test("corpusDiff classifies added/removed/changed/unchanged, treats " +
    "null content as empty, and keys the join by id only") {
    val spark2 = TestSpark.spark
    import spark2.implicits._
    val prev = Seq(
      (1L, Some("a"), "s1"),  // unchanged
      (2L, Some("b"), "s1"),  // text change
      (3L, Some("c"), "s1"),  // removed
      (4L, None: Option[String], "s1"),  // null -> "x": changed
      (5L, Some("e"), "s1")   // source change
    ).toDF("id", "text", "source")
    val cur = Seq(
      (1L, Some("a"), "s1"),
      (2L, Some("B"), "s1"),
      (4L, Some("x"), "s1"),
      (5L, Some("e"), "s2"),
      (6L, Some("f"), "s1")   // added
    ).toDF("id", "text", "source")
    val out = Profiling.corpusDiff(prev, cur, "id", Seq("text", "source"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "changed", 5L -> "changed", 6L -> "added"))
    // the separator prevents column-boundary collisions: ("ab","c")
    // must NOT equal ("a","bc")
    val l = Seq((1L, "ab", "c")).toDF("id", "text", "source")
    val r = Seq((1L, "a", "bc")).toDF("id", "text", "source")
    val shifted = Profiling.corpusDiff(l, r, "id", Seq("text", "source"))
      .collect().map(_.getString(1)).toSeq
    assert(shifted == Seq("changed"))
    intercept[IllegalArgumentException](
      Profiling.corpusDiff(l, r, "id", Nil))
  }

  test("binaryAuc: hand-checked tie case, perfect/inverted separation, " +
    "all-ties 0.5, degenerate null") {
    val spark2 = TestSpark.spark
    import spark2.implicits._
    def auc(rows: Seq[(Double, Long)]): Option[Double] = {
      val r = Profiling.binaryAuc(rows.toDF("s", "y"), col("s"), col("y"))
        .collect().head
      if (r.isNullAt(2)) None else Some(r.getDouble(2))
    }
    // ranks asc with average-rank ties: scores (1,1,2,3), labels
    // (0,1,0,1): positive ranks 1.5 + 4 = 5.5 -> AUC (5.5-3)/4 = 0.625
    assert(auc(Seq((1.0, 0L), (1.0, 1L), (2.0, 0L), (3.0, 1L)))
      .contains(0.625))
    assert(auc(Seq((0.1, 0L), (0.2, 0L), (0.8, 1L), (0.9, 1L))).contains(1.0))
    assert(auc(Seq((0.9, 0L), (0.8, 0L), (0.2, 1L), (0.1, 1L))).contains(0.0))
    assert(auc(Seq((0.5, 0L), (0.5, 1L), (0.5, 0L), (0.5, 1L))).contains(0.5))
    assert(auc(Seq((0.5, 1L), (0.7, 1L))).isEmpty)
    // agreement with the O(n^2) definition on a pseudo-random set:
    // AUC = (wins + ties/2) / (np*nn) over all positive-negative pairs
    val data = (0 until 200).map { i =>
      ((i * 37 % 23).toDouble, if ((i * 37 % 23) + (i % 5) >= 13) 1L else 0L)
    }
    val pos = data.filter(_._2 == 1L).map(_._1)
    val neg = data.filter(_._2 == 0L).map(_._1)
    val wins = (for (p0 <- pos; n0 <- neg)
      yield if (p0 > n0) 1.0 else if (p0 == n0) 0.5 else 0.0).sum
    val expected = wins / (pos.size.toDouble * neg.size.toDouble)
    assert(auc(data).exists(a => math.abs(a - expected) < 1e-12))
  }

  test("calibrationBins: clamping, observed rates, absent empty bins") {
    val spark2 = TestSpark.spark
    import spark2.implicits._
    val rows = Seq((0.05, 0L), (0.05, 1L), (0.95, 1L), (1.0, 1L), (0.55, 0L))
    val out = Profiling.calibrationBins(rows.toDF("s", "y"),
        col("s"), col("y"), bins = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    // score 1.0 clamps into bin 9; bins with no rows are absent
    assert(out.keySet == Set(0L, 5L, 9L))
    assert(out(0L) == ((0.05, 2L, 1L, 0.5)))
    assert(out(5L) == ((0.55, 1L, 0L, 0.0)))
    assert(out(9L) == ((0.95, 2L, 2L, 1.0)))
    intercept[IllegalArgumentException](
      Profiling.calibrationBins(rows.toDF("s", "y"), col("s"), col("y"), 0))
  }

  test("tokenDistributionDrift: identical slices diverge exactly zero, " +
    "disjoint slices dominate mild drift, JS is symmetric") {
    import spark.implicits._
    def drift(rows: Seq[(Long, String, String)]) =
      Profiling.tokenDistributionDrift(
          rows.toDF("doc_id", "lang", "text"), "text", "lang",
          col("doc_id") % 2 === 0)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3),
            r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    val out = drift(Seq(
      // same: A and B carry identical token multisets
      (0L, "same", "x y z x"), (1L, "same", "x y z x"),
      // mild: one token swapped
      (2L, "mild", "x y z x"), (3L, "mild", "x y z w"),
      // disjoint: no shared vocabulary at all
      (4L, "disj", "a b c d"), (5L, "disj", "p q r s")))
    val same = out("same")
    assert(same._1 == 4 && same._2 == 4 && same._3 == 3)
    assert(same._4 == 0.0 && same._5 == 0.0 && same._6 == 0.0,
      s"identical slices must diverge exactly 0, got $same")
    assert(out("disj")._3 == 8)
    assert(out("disj")._6 > out("mild")._6 && out("mild")._6 > 0,
      s"disj ${out("disj")._6} must beat mild ${out("mild")._6} > 0")
    assert(out("disj")._4 > out("mild")._4 && out("disj")._5 > out("mild")._5)
    // swapping the slice labels transposes the KLs and leaves JS fixed
    val sw = Profiling.tokenDistributionDrift(
        Seq((0L, "disj", "a b c d"), (1L, "disj", "p q r s"))
          .toDF("doc_id", "lang", "text"), "text", "lang",
        col("doc_id") % 2 =!= 0)
      .collect().map(r => (r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      .head
    assert(sw._1 == out("disj")._5 && sw._2 == out("disj")._4 &&
      sw._3 == out("disj")._6)
  }
}
