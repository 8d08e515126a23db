package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** PII scrub + contamination unit cases the q70/q71 oracles don't
  * exercise: multiple occurrences per doc, null text, boundary
  * non-matches, and the contamination threshold edge. */
class PiiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def redact(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(TextAnalysis.redactPii(col("t"))).collect()(0).getString(0)
  }

  test("redaction handles multiple hits, order, and near-misses") {
    assert(redact("a@b.co and c.d+e@f-g.org wrote") == "<EMAIL> and <EMAIL> wrote")
    assert(redact("call 555-123-4567 or 555-000-1111") == "call <PHONE> or <PHONE>")
    assert(redact("host 10.0.0.1 peer 192.168.255.3") == "host <IP> peer <IP>")
    // phone inside a longer digit run must NOT match (\b anchors)
    assert(redact("id 1555-123-45678") == "id 1555-123-45678")
    // bare domain without local part is not an email
    assert(redact("see example.com now") == "see example.com now")
    // email is redacted before the IP pass sees its dotted digits
    assert(redact("x 1.2.3.4@mail.example.com y") == "x <EMAIL> y")
  }

  test("null text stays null; counts are per-occurrence") {
    import spark.implicits._
    val df = Seq(Option("a@b.co a@b.co 10.0.0.1"), None).toDF("t")
    val r = df.select(
      TextAnalysis.redactPii(col("t")).as("red"),
      TextAnalysis.piiCount(col("t"), TextAnalysis.EmailRe).as("ne"),
      TextAnalysis.piiCount(col("t"), TextAnalysis.Ipv4Re).as("ni")).collect()
    assert(r(0).getString(0) == "<EMAIL> <EMAIL> <IP>")
    assert(r(0).getLong(1) == 2L && r(0).getLong(2) == 1L)
    assert(r(1).isNullAt(0) && r(1).isNullAt(1) && r(1).isNullAt(2))
  }

  test("contamination: threshold edge and benchmark exclusion") {
    import spark.implicits._
    // bench doc shares exactly 3 shingles with doc 1, 2 with doc 2
    val bench = Seq((100L, "a b c d e")).toDF("doc_id", "text") // shingles: abc bcd cde
    val corpus = Seq(
      (1L, "a b c d e x"), // abc bcd cde {dex} -> overlap 3
      (2L, "a b c d y"), // abc bcd {cdy} -> overlap 2
      (3L, "p q r s t")).toDF("doc_id", "text") // overlap 0
    def run(min: Long) =
      Dedup.contamination(corpus, bench, "doc_id", "text", shingleN = 3, minOverlap = min)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(run(3L) == Map(1L -> 3L))
    assert(run(2L) == Map(1L -> 3L, 2L -> 2L))
    assert(run(1L) == Map(1L -> 3L, 2L -> 2L))
  }
}
