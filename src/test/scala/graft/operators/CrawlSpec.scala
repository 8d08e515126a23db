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
