package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.expressions.RobotsCodec

/** RFC 9309 robots.txt semantics, pinned case by case against the
  * published spec: group selection and merging, longest-match
  * precedence with allow-wins ties, `*`/`$` pattern semantics, empty
  * rules, unknown fields, and the frontier-side politeness join. */
class RobotsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ok(txt: String, ua: String, path: String): Boolean =
    RobotsCodec.allowed(RobotsCodec.rulesFor(txt, ua), path)

  test("group selection: named group replaces *, merging across groups") {
    val txt =
      "User-agent: graftbot\nDisallow: /private\n" +
        "User-agent: *\nDisallow: /\n" +
        "User-agent: graftbot\nDisallow: /tmp\n"
    // named groups MERGE (RFC 9309 §2.2.1): /private AND /tmp blocked
    assert(!ok(txt, "graftbot", "/private/x"))
    assert(!ok(txt, "graftbot", "/tmp"))
    // ...and the * group's Disallow: / does NOT apply to the named agent
    assert(ok(txt, "graftbot", "/public"))
    // an unnamed agent falls back to *
    assert(!ok(txt, "otherbot", "/public"))
    // agent match is case-insensitive and exact
    assert(ok(txt, "GraftBot", "/public"))
    assert(!ok(txt, "graftbot2", "/public")) // not a substring match
  }

  test("no robots rules at all = unrestricted") {
    assert(ok("", "graftbot", "/anything"))
    assert(ok("Sitemap: https://x/s.xml", "graftbot", "/"))
    // a named group with ZERO rules is still a match -> unrestricted.
    // (it can only exist where no UA line follows: per the RFC's ABNF,
    // consecutive User-agent lines — blank lines between or not — head
    // ONE shared group)
    val txt = "User-agent: *\nDisallow: /\nUser-agent: graftbot\n"
    assert(ok(txt, "graftbot", "/x"))
    assert(!ok(txt, "other", "/x"))
    // ...and the shared-group form applies the rules to BOTH agents
    val shared = "User-agent: graftbot\n\nUser-agent: *\nDisallow: /"
    assert(!ok(shared, "graftbot", "/x"))
    assert(!ok(shared, "other", "/x"))
  }

  test("longest match wins; allow wins ties (RFC 9309 §2.2.2)") {
    val txt = "User-agent: *\nDisallow: /page\nAllow: /page/open\n"
    assert(!ok(txt, "b", "/page/closed"))
    assert(ok(txt, "b", "/page/open/deep")) // longer allow overrides
    // exact tie -> allow
    val tie = "User-agent: *\nDisallow: /dir/a\nAllow: /dir/b\n"
    assert(!ok(tie, "b", "/dir/a"))
    assert(ok(tie, "b", "/dir/b"))
    val sameLen = "User-agent: *\nDisallow: /x\nAllow: /x\n"
    assert(ok(sameLen, "b", "/x/y")) // identical octets -> allow wins
  }

  test("* matches any sequence; trailing $ anchors; mid-pattern $ is literal") {
    val txt = "User-agent: *\nDisallow: /*.pdf$\nDisallow: /a*b\nDisallow: /c$d\n"
    assert(!ok(txt, "b", "/docs/x.pdf"))
    assert(ok(txt, "b", "/docs/x.pdf?dl=1")) // $ anchored: query breaks the match
    assert(!ok(txt, "b", "/aXXXb/tail"))     // * spans, prefix match continues
    assert(!ok(txt, "b", "/ab2"))            // * can match empty: /ab prefix
    assert(ok(txt, "b", "/aXc"))             // no 'b' after the run: no match
    assert(!ok(txt, "b", "/c$d/e"))          // mid-pattern $ literal
    assert(ok(txt, "b", "/cd"))
  }

  test("empty Disallow matches nothing; empty path behaves as /") {
    val txt = "User-agent: *\nDisallow:\n"
    assert(ok(txt, "b", "/anything"))
    val root = "User-agent: *\nDisallow: /\n"
    assert(!ok(root, "b", ""))
    assert(!ok(root, "b", "?q=1")) // query-only path matches as /?q=1
  }

  test("unknown fields and comments do not split a group") {
    val txt =
      "User-agent: * # all crawlers\n" +
        "Crawl-delay: 10\n" +
        "Disallow: /a # comment\n" +
        "Sitemap: https://h.example/sitemap.xml\n" +
        "Disallow: /b\n"
    assert(!ok(txt, "b", "/a"))
    assert(!ok(txt, "b", "/b")) // the Sitemap line must not orphan this rule
    assert(ok(txt, "b", "/c"))
  }

  test("rules before any User-agent line are ignored") {
    assert(ok("Disallow: /a\nUser-agent: *\nDisallow: /b", "x", "/a"))
    assert(!ok("Disallow: /a\nUser-agent: *\nDisallow: /b", "x", "/b"))
  }

  test("robots.txt parses at most 500 KiB (RFC 9309 §2.4) — rules past " +
    "the cap are ignored, rules before it survive") {
    val filler = "# padding comment line\n" * (500 * 1024 / 23 + 1)
    val txt = "User-agent: *\nDisallow: /early\n" + filler +
      "User-agent: *\nDisallow: /late\n"
    assert(!ok(txt, "bot", "/early/x"))
    assert(ok(txt, "bot", "/late/x")) // beyond the cap: never parsed
  }

  test("urlPathQuery extracts path+query, drops fragments, defaults to /") {
    val s = spark
    import s.implicits._
    val got = Seq(
      "https://h.example/a/b?q=1#frag",
      "https://h.example",
      "https://h.example/",
      "http://h.example?q=2",
      "not a url").toDF("url")
      .select(TextAnalysis.urlPathQuery(col("url"))).as[String].collect().toSeq
    assert(got == Seq("/a/b?q=1", "/", "/", "?q=2", "/"))
  }

  test("robotsFilter: host-joined gate; missing or null robots allows") {
    val s = spark
    import s.implicits._
    val urls = Seq(
      "https://a.example/ok", "https://a.example/private/1",
      "https://b.example/anything", // no robots row
      "https://c.example/anything"  // null robots body
    ).toDF("url")
    val robots = Seq(
      ("a.example", "User-agent: *\nDisallow: /private"),
      ("c.example", null.asInstanceOf[String])).toDF("host", "txt")
    val kept = Crawl.robotsFilter(urls, "url", robots, "host", "txt", "graftbot")
      .as[String].collect().toSet
    assert(kept == Set("https://a.example/ok", "https://b.example/anything",
      "https://c.example/anything"))
    // the temp join columns must not leak
    assert(Crawl.robotsFilter(urls, "url", robots, "host", "txt", "g")
      .columns.toSeq == Seq("url"))
  }

  test("the SQL surface graft_robots_allowed agrees with the codec") {
    val s = spark
    import s.implicits._
    val txt = "User-agent: *\nDisallow: /no"
    val got = Seq(("/no/1", txt), ("/yes", txt))
      .toDF("path", "txt")
      .selectExpr("graft_robots_allowed(txt, 'bot', path) AS a")
      .as[Boolean].collect().toSeq
    assert(got == Seq(false, true))
  }

  // ---- extension fields: Crawl-delay (group-scoped) + Sitemap (global)

  test("Crawl-delay: named group wins over *, first value in scope, junk ignored") {
    def delay(txt: String, ua: String) = RobotsCodec.extensionsFor(txt, ua)._1
    val txt =
      "User-agent: graftbot\nCrawl-delay: 2\nDisallow: /x\n" +
        "User-agent: *\nCrawl-delay: 100\n"
    assert(delay(txt, "graftbot") === Some(2.0))
    assert(delay(txt, "otherbot") === Some(100.0)) // falls back to *
    // fractional values are in the wild
    assert(delay("User-agent: *\nCrawl-delay: 0.5", "b") === Some(0.5))
    // unparseable / negative -> none declared
    assert(delay("User-agent: *\nCrawl-delay: soon", "b") === None)
    assert(delay("User-agent: *\nCrawl-delay: -3", "b") === None)
    // named group WITHOUT a delay does not inherit *'s (scope selected
    // once, like rule selection)
    val noNamed = "User-agent: graftbot\nDisallow: /x\n" +
      "User-agent: *\nCrawl-delay: 7"
    assert(delay(noNamed, "graftbot") === None)
    // first value per selected scope wins across merged groups
    val merged = "User-agent: graftbot\nCrawl-delay: 3\n" +
      "User-agent: graftbot\nCrawl-delay: 9"
    assert(delay(merged, "graftbot") === Some(3.0))
    // a Crawl-delay before any User-agent line belongs to no group
    assert(delay("Crawl-delay: 4", "b") === None)
  }

  test("Sitemap: file-global, any position, order kept, group not split") {
    val txt =
      "Sitemap: https://a.example/s1.xml\n" +
        "User-agent: graftbot\nDisallow: /x\n" +
        "Sitemap: https://a.example/s2.xml\n" + // inside the group...
        "Allow: /x/ok\n" + // ...which stays intact around it
        "User-agent: *\nDisallow: /\n"
    val (_, sm) = RobotsCodec.extensionsFor(txt, "graftbot")
    assert(sm === Vector("https://a.example/s1.xml", "https://a.example/s2.xml"))
    // the group survived the interleaved Sitemap line: /x/ok still allowed
    assert(ok(txt, "graftbot", "/x/ok"))
    assert(!ok(txt, "graftbot", "/x/other"))
    assert(RobotsCodec.extensionsFor("User-agent: *\nDisallow: /", "b")._2.isEmpty)
  }

  test("SQL surfaces graft_robots_crawl_delay / graft_robots_sitemaps agree with the codec") {
    val s = spark
    import s.implicits._
    val txt = "User-agent: bot\nCrawl-delay: 2.5\n" +
      "Sitemap: https://h.example/a.xml\nSitemap: https://h.example/b.xml"
    val row = Seq(txt).toDF("txt")
      .selectExpr("graft_robots_crawl_delay(txt, 'bot') AS d",
        "graft_robots_sitemaps(txt) AS sm",
        "graft_robots_crawl_delay(txt, 'other') AS dn")
      .head()
    assert(row.getDouble(0) === 2.5)
    assert(row.getSeq[String](1) ===
      Seq("https://h.example/a.xml", "https://h.example/b.xml"))
    assert(row.isNullAt(2)) // no group for 'other' and no * group
  }

  test("hostFetchBudget + rateLimitedFrontier: declared delay drives the per-host cap") {
    val s = spark
    import s.implicits._
    val robots = Seq(
      ("fast.example", "User-agent: *\nCrawl-delay: 2"), // 60/2 = 30 -> cap 5
      ("slow.example", "User-agent: *\nCrawl-delay: 25"), // 60/25 = 2.4 -> 2
      ("stop.example", "User-agent: *\nCrawl-delay: 90"), // 60/90 -> 0
      ("none.example", "User-agent: *\nDisallow: /private\n" +
        "Sitemap: https://none.example/s.xml") // no delay -> default 15 -> 4
    ).toDF("host", "txt")
    val budgets = Crawl.hostFetchBudget(robots, "host", "txt", "graftbot",
        windowSec = 60.0, defaultDelaySec = 15.0, maxPerHost = 5)
      .collect().map(r => r.getString(0) ->
        ((if (r.isNullAt(1)) -1.0 else r.getDouble(1)), r.getInt(2), r.getInt(3))).toMap
    assert(budgets("fast.example") === ((2.0, 5, 0)))
    assert(budgets("slow.example") === ((25.0, 2, 0)))
    assert(budgets("stop.example") === ((90.0, 0, 0)))
    assert(budgets("none.example") === ((-1.0, 4, 1)))
    // frontier: 6 urls per host (incl. an unknown host -> default budget)
    val links = (for {
      h <- Seq("fast", "slow", "stop", "none", "norobots")
      i <- 0 until 6
    } yield s"https://$h.example/p/$i").toDF("href")
    val got = Crawl.rateLimitedFrontier(links, "href",
        seen = Seq.empty[String].toDF("url"), blocked = Nil,
        robots = robots, hostCol = "host", txtCol = "txt",
        userAgent = "graftbot", windowSec = 60.0, defaultDelaySec = 15.0,
        maxPerHost = 5)
      .groupBy("host").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map(
      "fast.example" -> 5L, // static cap binds
      "slow.example" -> 2L, // declared delay binds
      "none.example" -> 4L, // default delay (no declared value)
      "norobots.example" -> 4L)) // no robots row at all -> default budget
    // stop.example absent entirely: budget 0 this window
  }
}
