package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.expressions.TextRepair
import org.apache.spark.unsafe.types.UTF8String

/** Encoding repair + SURT keys: the mojibake inverse-decode against
  * INDEPENDENTLY derived round-trips (encode with the JDK's own cp1252
  * codec, not the expression's table), NFC against the platform
  * normalizer, pass-through contracts, and the SURT reordering rules. */
class TextRepairSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fix(s: String): String =
    TextRepair.fixMojibake(UTF8String.fromString(s)).toString

  /** Break `s` the way the defect happens in the wild: its UTF-8 bytes
    * decoded as windows-1252 (the JDK codec — independent of the
    * expression's inverse table). */
  private def breakOnce(s: String): String =
    new String(s.getBytes("UTF-8"), "windows-1252")

  test("single, double and triple mojibake unwind to the original " +
    "(JDK-codec round-trips, multilingual)") {
    for (orig <- Seq("café", "don’t — really", "привет мир",
      "naïve résumé", "日本語",
      "€ 9,99 • deal")) {
      assert(fix(breakOnce(orig)) == orig, s"single: $orig")
    }
    // deeper nesting only for strings whose INTERMEDIATE bytes avoid
    // cp1252's five unmappable slots (0x81/8D/8F/90/9D): re-breaking
    // e.g. — or Ð routes through 0x9D/0x90, which the wild decode
    // turns into U+FFFD — information genuinely destroyed, no tool
    // can unwind it (ftfy included)
    for (orig <- Seq("café", "naïve résumé")) {
      assert(fix(breakOnce(breakOnce(orig))) == orig, s"double: $orig")
    }
    assert(fix(breakOnce(breakOnce(breakOnce("café")))) == "café")
  }

  test("pass-through: ASCII, already-clean accents, truncated leads, " +
    "and chars outside the cp1252 image stay untouched") {
    for (s <- Seq("plain ascii", "café already fine", "lone Ã stays",
      "日本語 clean cjk", "", "aÃ")) {
      assert(fix(s) == s, s"must pass through: '$s'")
    }
  }

  test("nfc: decomposed sequences compose; NFC text returns the SAME " +
    "object (no-allocation fast path); astral chars survive") {
    def nfc(s: String): String =
      TextRepair.nfc(UTF8String.fromString(s)).toString
    assert(nfc("éclair") == "éclair")
    assert(nfc("Ångström") == "Ångström")
    val already = UTF8String.fromString("café 😀")
    assert(TextRepair.nfc(already) eq already)
    assert(nfc("x😀é") == "x😀é")
  }

  test("expressions run inside whole-stage codegen and handle nulls") {
    // range, not a local Seq: ConvertToLocalRelation would fold a
    // LocalTableScan and hide the codegen path under test
    val df = spark.range(2)
      .select(when(col("id") === 0, lit(breakOnce("caf\u00e9 \u00e9clair")))
        .as("t"))
      .select(TextAnalysis.fixMojibake(col("t")).as("r"),
        TextAnalysis.nfcNormalize(col("t")).as("n"))
    // "*(1)" is the WholeStageCodegen stage marker in the plan string —
    // both expressions must sit INSIDE the starred projection
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_fix_mojibake"), plan)
    val rows = df.collect()
    assert(rows.exists(r => r.isNullAt(0) && r.isNullAt(1)))
    assert(rows.exists(r => !r.isNullAt(0) &&
      r.getString(0) == "caf\u00e9 \u00e9clair"))
  }

  test("surtKey: label reversal, www-strip, path+query kept, " +
    "authority-only URL gets '/', non-URLs are null") {
    val out = Seq(
      "https://www.news.example.com/a?q=1",
      "https://example.com",
      "https://a.b.co.uk/x/y",
      "/relative", "not a url")
      .toDF("u").select(TextAnalysis.surtKey(col("u")).as("s"))
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(out == Seq(
      Some("com,example,news)/a?q=1"),
      Some("com,example)/"),
      Some("uk,co,b,a)/x/y"),
      None, None))
  }

  test("surtKey sorts a domain's URLs contiguously (the CDX property)") {
    val keys = Seq(
      "https://z.other.net/1",
      "https://www.example.com/b",
      "https://sub.example.com/a",
      "https://example.com/c")
      .toDF("u")
      .select(TextAnalysis.surtKey(TextAnalysis.canonicalUrl(col("u"))).as("s"))
      .collect().map(_.getString(0)).sorted
    // all example.com keys share the 'com,example' prefix and sort
    // together, with the bare domain before its subdomain
    assert(keys.count(_.startsWith("com,example")) == 3)
    assert(keys.filter(_.startsWith("com,example")).head == "com,example)/b")
  }
}
