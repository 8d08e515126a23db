package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's hand-rolled child-JSON parser must round-trip the
  * exact shape the child emits — times, job counts, the chunk canary, and
  * already-escaped error strings. */
class BenchParseSpec extends AnyFunSuite {

  test("parseChild reads times, warm reruns, jobs, canary and errors from a child line") {
    val line = """{"metric":"pass","queries":{"q01_group_agg":0.51,"q46_dag":25.3,"q99_x":-1},""" +
      """"warm":{"q46_dag":14.1},""" +
      """"jobs":{"q01_group_agg":4,"q46_dag":195},"canary":0.179,""" +
      """"errors":{"q99_x":"java.lang.RuntimeException: boom \"quoted\""},""" +
      """"sf":"/tmp/sf"}"""
    val (times, warm, jobs, canary, errors) = Bench.parseChild(line)
    assert(times === Map("q01_group_agg" -> 0.51, "q46_dag" -> 25.3, "q99_x" -> -1.0))
    assert(warm === Map("q46_dag" -> 14.1))
    assert(jobs === Map("q01_group_agg" -> 4L, "q46_dag" -> 195L))
    assert(canary === 0.179)
    assert(errors.keySet === Set("q99_x"))
    assert(errors("q99_x").contains("boom"))
  }

  test("parseChild tolerates empty sections, missing warm and missing canary") {
    val (times, warm, jobs, canary, errors) =
      Bench.parseChild("""{"metric":"pass","queries":{},"jobs":{},"errors":{},"sf":"x"}""")
    assert(times.isEmpty && warm.isEmpty && jobs.isEmpty && errors.isEmpty)
    assert(canary === 0.0)
  }

  // the tainted-flag contract: isolated outlier chunks must not trip it,
  // a sustained contention window must
  test("noiseRatio shrugs off isolated outlier chunks") {
    val quiet = Seq.fill(28)(0.2) ++ Seq(0.14, 0.30) // one fast, one slow
    assert(Bench.noiseRatio(quiet) < 1.5)
    assert(Bench.noiseRatio(Seq(0.2)) === 1.0)
    assert(Bench.noiseRatio(Nil) === 1.0)
  }

  test("noiseRatio fires on a sustained contention window") {
    // half the run's chunks inflated 4x: a noisy hour, not a noisy pass
    val contended = Seq.fill(15)(0.2) ++ Seq.fill(15)(0.8)
    assert(Bench.noiseRatio(contended) > 1.5)
  }

  // the round-7 headline rule: min over ALL passes. The round-6 rule
  // (warm-min whenever any warm draw exists) let one noisy warm draw
  // override every cold pass — q71's official 4.14 s against its own
  // 0.89 s cold min. The headline must never exceed the cold min.
  test("headlineOf is min over cold and warm together, never above cold min") {
    assert(Bench.headlineOf(0.89, Seq(4.14)) === 0.89) // r6's q71 inversion
    assert(Bench.headlineOf(25.3, Seq(14.1, 13.4)) === 13.4) // warm speedup counts
    assert(Bench.headlineOf(0.5, Nil) === 0.5) // no warm rerun
    assert(Bench.headlineOf(-1.0, Seq(2.0)) === -1.0) // failed query passes through
    assert(Bench.headlineOf(1.2, Seq(-1.0, 0.9)) === 0.9) // negative warm sentinel ignored
  }

  // the stdout-facing official line must survive a byte-bounded capture:
  // the capture window is EXACTLY 2000 bytes (measured: the r6-r8
  // artifacts' "tail" fields are all len 2000; r6's 11 KB full line got
  // cut to an unparseable tail, r8's compact line fit and parsed). The
  // compact line carries the headline numbers under qNN short keys and
  // must stay under that window — with margin — for the WHOLE suite at
  // worst-case 5-char values, parse as JSON, and fall back to full
  // names on collision.
  test("compactLine fits the capture window, parses, and keys stay unique") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    // worst byte shape since the round-11 1-dp encoding: every query at
    // a 3-char value ("0.9" — the widest a sub-10s value can print) —
    // pin the budget with EVERY query there
    val headline = names.map(n => n -> 0.94).toMap
    val line = Bench.compactLine(names, headline, 1234.56, "1.307",
      tainted = false, nErrors = 0, sfDir = "/root/testdata/sf0.1")
    // 2000-byte capture minus ~50 of safety: the sbt "[success] Total
    // time ..." epilogue that used to follow the line inside the
    // capture is suppressed since round 11 (build.sbt showSuccess :=
    // false), so the whole window belongs to the artifact again
    assert(line.length < 1950, s"compact line is ${line.length} bytes " +
      "against the measured 2000-byte capture tail")
    assert(!line.contains("\n"))
    // structural parse via the same hand-rolled reader the harness trusts
    val (times, _, _, _, _) = Bench.parseChild(line)
    assert(times.size == names.size, s"${times.size} keys vs ${names.size} queries")
    assert(times.keySet == names.map(_.takeWhile(_ != '_')).toSet)
    assert(times.values.forall(_ == 0.9))
    assert(line.contains("\"value\":1235")) // 10s+: whole seconds
    // ALL values print one dp since round 11 (160-query byte budget;
    // BENCH_LAST.json keeps full precision, and 0.1 s resolution is
    // far below this host's 1.5-3x ambient swing)
    val mid = Bench.compactLine(Seq("q01_a"), Map("q01_a" -> 1.38), 1.38,
      "1.0", tainted = false, nErrors = 0, sfDir = "x")
    assert(mid.contains("\"q01\":1.4"), mid)
    val mixed = Bench.compactLine(Seq("q01_a", "q02_b", "q03_c"),
      Map("q01_a" -> 14.55, "q02_b" -> 0.47, "q03_c" -> 0.04), 15.06, "1.0",
      tainted = false, nErrors = 0, sfDir = "x")
    assert(mixed.contains("\"q01\":15") && mixed.contains("\"q02\":0.5") &&
      mixed.contains("\"q03\":0}"), mixed) // sub-0.05 floors to 0; 10s+ whole
    // failed queries keep their -1 sentinel
    val failed = Bench.compactLine(Seq("q01_a"), Map("q01_a" -> -1.0), 0.0,
      "1.0", tainted = false, nErrors = 1, sfDir = "x")
    assert(failed.contains("\"q01\":-1"), failed)
    // short-prefix collision => full names (never silently merged keys)
    val clash = Seq("q01_a", "q01_b")
    val clashLine = Bench.compactLine(clash, clash.map(_ -> 1.0).toMap, 2.0,
      "1.0", tainted = false, nErrors = 0, sfDir = "x")
    assert(clashLine.contains("\"q01_a\":") && clashLine.contains("\"q01_b\":"))
  }

  // Per-chunk starvation taint (round 11): the round-10 driver artifact
  // recorded q147 at 133.3 s (quiet-window 1.1 s) with "tainted":false —
  // the starvation hit 1-2 chunks of ~34, below the global p90/p10
  // ratio's resolution. The per-chunk instrument must flag exactly the
  // queries whose headline exists ONLY under a canary-outlier chunk,
  // and a re-forked quiet draw must clear them.
  test("starvedSuspects flags headline draws from canary-outlier chunks; a quiet re-fork clears them") {
    // ~the round-10 shape: 30 quiet chunks at ~0.2 s, one starved at 2.4 s
    val canaries = Seq.fill(30)(0.2) :+ 2.4
    val names = Seq("q147_surt", "q46_dag", "q01_agg")
    // q147: its only draws (cold + warm) came from the starved chunk
    // q46: slow draw from the starved chunk, but a quiet chunk
    //      reproduced the headline — trustworthy, NOT suspect
    // q01: all draws quiet
    val times = Map(
      "q147_surt" -> Seq(133.3, 140.1),
      "q46_dag" -> Seq(68.4, 16.5),
      "q01_agg" -> Seq(0.5, 0.52))
    val tCan = Map(
      "q147_surt" -> Seq(2.4, 2.4),
      "q46_dag" -> Seq(2.4, 0.2),
      "q01_agg" -> Seq(0.2, 0.2))
    val warm = Map("q147_surt" -> Seq(135.0))
    val wCan = Map("q147_surt" -> Seq(2.4))
    assert(Bench.starvedSuspects(names, times, tCan, warm, wCan,
      canaries, 1.5) === Seq("q147_surt"))
    // the targeted re-fork: one quiet-chunk draw for q147 clears it even
    // though the new draw's 1.1 s IS now the headline from a quiet chunk
    val times2 = times.updated("q147_surt", times("q147_surt") :+ 1.1)
    val tCan2 = tCan.updated("q147_surt", tCan("q147_surt") :+ 0.21)
    assert(Bench.starvedSuspects(names, times2, tCan2, warm, wCan,
      canaries :+ 0.21, 1.5) === Nil)
    // a re-fork that lands in ANOTHER starved chunk does not clear it
    val times3 = times.updated("q147_surt", times("q147_surt") :+ 98.0)
    val tCan3 = tCan.updated("q147_surt", tCan("q147_surt") :+ 2.2)
    assert(Bench.starvedSuspects(names, times3, tCan3, warm, wCan,
      canaries :+ 2.2, 1.5) === Seq("q147_surt"))
    // under 4 canaries there is no trustworthy median: no suspects
    assert(Bench.starvedSuspects(names, times, tCan, warm, wCan,
      Seq(0.2, 2.4), 1.5) === Nil)
    // failed draws (-1) never make a query suspect
    assert(Bench.starvedSuspects(Seq("qf_x"), Map("qf_x" -> Seq(-1.0)),
      Map("qf_x" -> Seq(2.4)), Map.empty[String, Seq[Double]],
      Map.empty[String, Seq[Double]], canaries, 1.5) === Nil)
  }

  test("compactLine carries the suspect list only when non-empty") {
    val names = Seq("q147_surt", "q01_agg")
    val headline = Map("q147_surt" -> 133.3, "q01_agg" -> 0.5)
    val clean = Bench.compactLine(names, headline, 133.8, "1.0",
      tainted = false, nErrors = 0, sfDir = "x")
    assert(!clean.contains("suspect"))
    val starved = Bench.compactLine(names, headline, 133.8, "1.0",
      tainted = false, nErrors = 0, sfDir = "x",
      suspects = Seq("q147_surt"))
    assert(starved.contains(""""suspect":["q147"]"""), starved)
    // still parses under the harness's own reader
    val (times, _, _, _, _) = Bench.parseChild(starved)
    assert(times.keySet === Set("q147", "q01"))
  }

  // Interleaved A/B mode: the paired b/a ratios are the measurement —
  // failed queries stay visible but out of the median; the line must be
  // machine-parseable JSON.
  test("abJson pairs headlines, medians valid ratios, excludes failures") {
    val names = Seq("q01_a", "q02_b", "q03_c", "q04_d")
    val a = Map("q01_a" -> 2.0, "q02_b" -> 1.0, "q03_c" -> 4.0, "q04_d" -> -1.0)
    val b = Map("q01_a" -> 1.0, "q02_b" -> 1.5, "q03_c" -> 4.0, "q04_d" -> 2.0)
    val line = Bench.abJson(names, a, b, Seq(0.2, 0.2), Seq(0.2, 0.21), "sf")
    assert(line.contains(""""q01_a":{"a":2.0,"b":1.0,"ratio":0.5}"""), line)
    assert(line.contains(""""q02_b":{"a":1.0,"b":1.5,"ratio":1.5}"""), line)
    // failed A side: pair reported, ratio -1, not in the median
    assert(line.contains(""""q04_d":{"a":-1.0,"b":2.0,"ratio":-1}"""), line)
    // valid ratios 0.5, 1.5, 1.0 -> sorted (0.5, 1.0, 1.5), median 1.0
    assert(line.contains(""""median_ratio":1.0"""), line)
    assert(line.contains(""""n_pairs":3"""), line)
    // a query missing on one side entirely is omitted from "queries"
    val line2 = Bench.abJson(Seq("q09_z"), Map("q09_z" -> 1.0),
      Map.empty[String, Double], Nil, Nil, "sf")
    assert(line2.contains(""""queries":{}""") &&
      line2.contains(""""median_ratio":-1.0"""), line2)
  }

  test("noiseRatio trims at least one outlier per side on small runs") {
    // a 3-canary SPARK_GRAFT_BENCH_ONLY subset with one jittery draw on
    // a quiet machine must not read tainted (max/min here is 1.56)
    assert(Bench.noiseRatio(Seq(0.18, 0.20, 0.28)) === 1.0)
    val smallQuiet = Seq(0.20, 0.21, 0.19, 0.20, 0.31) // one outlier, n=5
    assert(Bench.noiseRatio(smallQuiet) < 1.5)
    // ...but a small run under sustained contention still fires
    val smallContended = Seq.fill(6)(0.2) ++ Seq.fill(6)(0.8)
    assert(Bench.noiseRatio(smallContended) > 1.5)
  }
}
