package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Crawl-frontier construction: canonical collapse, the absolute-URL
  * gate, registrable-suffix blocklist semantics, seen-set removal,
  * per-host politeness cap with deterministic ties — and the plan
  * shape (one url exchange reused by the anti-join, WindowGroupLimit
  * for the cap, no cartesian anywhere). */
class CrawlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(links: Seq[String], seen: Seq[String] = Nil,
                  blocked: Seq[String] = Seq("spam.example"),
                  cap: Int = 2): Seq[(String, String, Long, Int)] =
    Crawl.frontier(links.toDF("href"), "href",
        seen.toDF("url"), blocked, cap)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .toSeq.sorted

  test("canonical collapse feeds in-link counts; the absolute-URL gate " +
    "drops relative and schemeless hrefs") {
    val out = run(Seq(
      "https://a.example/p",
      "HTTPS://A.EXAMPLE:443/p?utm_source=x#f", // same page, messy fetch
      "https://a.example/q",
      "/relative", "mailto:x@y.example", "notaurl"))
    assert(out == Seq(
      ("a.example", "https://a.example/p", 2L, 1),
      ("a.example", "https://a.example/q", 1L, 2)))
  }

  test("blocklist is dot-suffix membership: subdomains drop, " +
    "lookalike hosts survive") {
    val out = run(Seq(
      "https://spam.example/x",
      "https://deep.sub.spam.example/y",
      "https://notspam.example/ok",
      "https://spam.example.evil.net/ok2"))
    assert(out.map(_._2) == Seq("https://notspam.example/ok",
      "https://spam.example.evil.net/ok2"))
  }

  test("seen URLs leave the frontier; the cap keeps top-inlinks per " +
    "host with ties to the smaller url") {
    val links = Seq.fill(3)("https://h.example/a") ++
      Seq.fill(3)("https://h.example/b") ++
      Seq.fill(2)("https://h.example/c") ++ Seq("https://h.example/d") ++
      Seq("https://other.example/z")
    val out = run(links, seen = Seq("https://h.example/a"), cap = 2)
    // a is seen (gone); b(3) rank 1, c(2) rank 2, d(1) capped out
    assert(out == Seq(
      ("h.example", "https://h.example/b", 3L, 1),
      ("h.example", "https://h.example/c", 2L, 2),
      ("other.example", "https://other.example/z", 1L, 1)))
  }

  test("empty seen set and empty blocklist are valid (fresh crawl)") {
    val out = run(Seq("https://x.example/1"), blocked = Nil, cap = 1)
    assert(out == Seq(("x.example", "https://x.example/1", 1L, 1)))
    intercept[IllegalArgumentException](
      Crawl.frontier(Seq("u").toDF("href"), "href", spark.emptyDataFrame
        .selectExpr("CAST(null AS STRING) AS url").limit(0), Nil, 0))
  }

  // ---- pageRank: integer fixed-point power method ----

  private def ranksOf(edges: Seq[(Long, Long)], iters: Int,
                      damping: Int = 85): Map[Long, Long] =
    Crawl.pageRank(edges.toDF("s", "d"), "s", "d", iterations = iters,
        dampingPct = damping)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("pageRank: a 2-cycle is a fixpoint at exactly scale/2 each — " +
    "mass conserved, bit-stable") {
    // base = 5e11; teleport = 75e9; rank' = 75e9 + 85*5e11/100 = 5e11
    for (iters <- Seq(1, 3, 7)) {
      val r = ranksOf(Seq((1L, 2L), (2L, 1L)), iters)
      assert(r == Map(1L -> 500000000000L, 2L -> 500000000000L), s"iters=$iters")
    }
  }

  test("pageRank: hand-computed star with a dangling sink (1->3, 2->3) — " +
    "dangling mass redistributes") {
    // N=3, base=333333333333, teleport = base*15/100 = 49999999999.
    // Node 3 is dangling; its mass D feeds every node floor(D/3).
    // iter1: D=base, share=111111111111
    //   r1=r2 = 49999999999 + (85*111111111111) div 100 = 144444444443
    //   r3    = 49999999999 + (85*(666666666666+111111111111)) div 100
    //         = 711111111109
    // iter2: D=711111111109, share=237037037036
    //   r1=r2 = 49999999999 + (85*237037037036) div 100 = 251481481479
    //   r3    = 49999999999 + (85*(288888888886+237037037036)) div 100
    //         = 497037037032
    val after1 = ranksOf(Seq((1L, 3L), (2L, 3L)), iters = 1)
    assert(after1 == Map(1L -> 144444444443L, 2L -> 144444444443L,
      3L -> 711111111109L))
    val after2 = ranksOf(Seq((1L, 3L), (2L, 3L)), iters = 2)
    assert(after2 == Map(1L -> 251481481479L, 2L -> 251481481479L,
      3L -> 497037037032L))
  }

  test("pageRank: total mass is conserved on dangling-heavy graphs " +
    "(only floor residues leak)") {
    // a frontier-shaped graph: 3 fetched hubs pointing at 9 unfetched
    // (dangling) leaves — without the dangling term, total mass decayed
    // toward teleport-only within a few iterations (round-9 caveat)
    val edges = for (h <- 0L to 2L; l <- 0L to 2L) yield (h, 10L + h * 3 + l)
    val r = ranksOf(edges, iters = 10)
    val total = r.values.sum
    // per iteration the floors lose < 2N + E units of the 1e12 scale
    assert(total > 1000000000000L - 1000L && total <= 1000000000000L,
      s"mass not conserved: $total")
    // dangling leaves still outrank nothing unfairly: hubs get the
    // teleport + redistributed share only (no in-edges)
    assert(r(10L) > r(0L), r)
  }

  test("pageRank: multi-edges collapse; in-degree drives rank order; " +
    "damping 0 is teleport-only") {
    // node 3 has two in-edges (one duplicated 3x), node 2 has one
    val edges = Seq((1L, 3L), (1L, 3L), (1L, 3L), (2L, 3L), (3L, 2L),
      (2L, 1L), (3L, 1L))
    val r = ranksOf(edges, iters = 5)
    assert(r(3L) > r(2L), s"in-degree 2 should outrank in-degree 1: $r")
    // duplicates collapsed: 1's outdeg is 1 (edge 1->3 once), so its
    // full (floored) mass flows to 3 each round — same result as the
    // dedup'd edge list
    val dedup = ranksOf(Seq((1L, 3L), (2L, 3L), (3L, 2L), (2L, 1L), (3L, 1L)), 5)
    assert(r == dedup)
    val flat = ranksOf(edges, iters = 3, damping = 0)
    assert(flat.values.toSet.size == 1, s"damping 0 must flatten: $flat")
  }

  test("pageRank: non-numeric and null node ids fail loudly instead of " +
    "silently dropping edges") {
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    // string keys: ANSI mode's cast already refuses (CAST_INVALID_INPUT)
    val e1 = intercept[Exception](
      Crawl.pageRank(Seq(("hostA", "hostB")).toDF("s", "d"), "s", "d",
        iterations = 1).collect())
    assert(msgs(e1).exists(m => m.contains("CAST_INVALID_INPUT") ||
      m.contains("map string keys to numeric ids")), e1)
    // genuine null ids: ANSI casts pass them through — the guard fires
    val e2 = intercept[Exception](
      Crawl.pageRank(Seq((Some(1L), Some(2L)), (None, Some(3L)))
        .toDF("s", "d"), "s", "d", iterations = 1).collect())
    assert(msgs(e2).exists(_.contains("null node id")), e2)
  }

  test("pageRank: guards reject bad knobs and empty graphs") {
    intercept[IllegalArgumentException](ranksOf(Seq((1L, 2L)), iters = 0))
    intercept[IllegalArgumentException](
      Crawl.pageRank(Seq((1L, 2L)).toDF("s", "d"), "s", "d", dampingPct = 101))
    intercept[IllegalArgumentException](
      Crawl.pageRank(Seq.empty[(Long, Long)].toDF("s", "d"), "s", "d")
        .collect())
  }

  // ---- HITS (Kleinberg '99): unnormalized alternating path counts —
  //      exact integers, hand-checkable

  private def hitsOf(edges: Seq[(Long, Long)], iters: Int): Map[Long, (Long, Long)] =
    Crawl.hits(edges.toDF("s", "d"), "s", "d", iterations = iters)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("hits: hand-computed star — auth counts in-pointing hub mass, " +
    "hub counts pointed-at authority mass, sequential update") {
    // 1->3, 2->3, 1->4. iter1: auth3=2, auth4=1; hub1=3, hub2=2.
    // iter2: auth3=hub1+hub2=5, auth4=hub1=3; hub1=8, hub2=5.
    val g = Seq((1L, 3L), (2L, 3L), (1L, 4L))
    assert(hitsOf(g, 1) == Map(
      1L -> ((0L, 3L)), 2L -> ((0L, 2L)), 3L -> ((2L, 0L)), 4L -> ((1L, 0L))))
    assert(hitsOf(g, 2) == Map(
      1L -> ((0L, 8L)), 2L -> ((0L, 5L)), 3L -> ((5L, 0L)), 4L -> ((3L, 0L))))
    // multi-edges collapse before counting
    assert(hitsOf(g ++ Seq((1L, 3L), (1L, 3L)), 2) == hitsOf(g, 2))
  }

  test("hits: a 2-cycle alternates mass without growth beyond degree 1") {
    // 1->2, 2->1: every auth/hub stays 1 at any depth (dmax=1)
    for (k <- Seq(1, 4, 9))
      assert(hitsOf(Seq((1L, 2L), (2L, 1L)), k) ==
        Map(1L -> ((1L, 1L)), 2L -> ((1L, 1L))), s"k=$k")
  }

  test("hits: the a-priori overflow guard fails loudly before iterating") {
    // dmax=10 over 30 iterations bounds values by 10^60 > Long.Max
    val fan = (2L to 11L).map(d => (1L, d))
    val e = intercept[IllegalArgumentException](hitsOf(fan, 30))
    assert(e.getMessage.contains("overflows BIGINT"), e.getMessage)
    // ...while the same graph at sane depth is exact and fine
    assert(hitsOf(fan, 3)(1L) == ((0L, 1000L))) // hub1 = 10*10*10
  }

  test("hits: null node ids fail loudly; empty graph rejected") {
    val e = intercept[Exception](
      Crawl.hits(Seq((Some(1L), Some(2L)), (None, Some(3L)))
        .toDF("s", "d"), "s", "d", iterations = 1).collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("null node id")), e)
    intercept[IllegalArgumentException](
      Crawl.hits(Seq.empty[(Long, Long)].toDF("s", "d"), "s", "d"))
  }

  test("plan: no cartesian; the politeness cap plans as a group-limit " +
    "(top-k prunes before materialization)") {
    val links = graft.Tables(spark, TestSpark.sfDir, "documents")
      .select(concat(lit("https://h"), col("doc_id") % 5,
        lit(".example/p/"), col("doc_id") % 11).as("href"))
    val plan = Crawl.frontier(links, "href",
        Seq.empty[String].toDF("url"), Seq("spam.example"), 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("WindowGroupLimit"), plan)
  }
}
