package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The pure-JVM WARC reader: spec-layout round trips through the
  * engine's own renderer, multi-member gzip (the per-record-gzip
  * convention), HTTP payload splitting, loud structural errors, and the
  * distributed one-task-per-file scan over the page fixture. */
class WarcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def render(recs: (String, String, String)*): Array[Byte] =
    Warc.renderResponses(recs.iterator.map { case (u, d, b) =>
      (u, d, b.getBytes(StandardCharsets.UTF_8))
    })

  test("render -> readRecords round-trips headers and exact payload bytes") {
    val bytes = render(
      ("https://x/1", "2026-01-01T00:00:00Z", "hello <b>world</b>"),
      ("https://x/2", "2026-01-02T00:00:00Z", ""))
    val recs = Warc.readRecords(new ByteArrayInputStream(bytes)).toSeq
    assert(recs.size == 2)
    assert(recs.head.headers("warc-type") == "response")
    assert(recs.head.headers("warc-target-uri") == "https://x/1")
    assert(recs.head.headers("warc-version") == "WARC/1.0")
    val (status, body) = (recs.map(r =>
      Warc.httpSplit(r.headers("content-type"), r.payload))).head
    assert(status.contains(200))
    assert(new String(body, "UTF-8") == "hello <b>world</b>")
    // the empty-body record still carries its HTTP header block
    val (s2, b2) = Warc.httpSplit(recs(1).headers("content-type"), recs(1).payload)
    assert(s2.contains(200) && b2.isEmpty)
  }

  test("multi-member gzip (one member per record batch) reads through") {
    // the Common Crawl convention: independently gzipped records
    // concatenated into one .warc.gz — GZIPInputStream must cross the
    // member boundary, not stop at the first trailer
    val out = new java.io.ByteArrayOutputStream()
    for (i <- 0 until 3) {
      val gz = new GZIPOutputStream(out)
      gz.write(render((s"https://m/$i", "2026-01-01T00:00:00Z", s"body $i")))
      gz.finish()
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_mm")
    java.nio.file.Files.write(dir.resolve("mm.warc.gz"), out.toByteArray)
    val df = Warc.readWarc(spark, s"$dir/*.warc.gz")
    assert(df.count() == 3)
    assert(df.select("target_uri").collect().map(_.getString(0)).sorted.toSeq ==
      (0 until 3).map(i => s"https://m/$i"))
  }

  test("httpSplit: status parse, missing terminator, non-http payloads") {
    val p = "HTTP/1.1 404 Not Found\r\nX: y\r\n\r\nmissing".getBytes("ISO-8859-1")
    val (s, b) = Warc.httpSplit("application/http;msgtype=response", p)
    assert(s.contains(404) && new String(b, "UTF-8") == "missing")
    // no CRLFCRLF: all header block, empty body
    val (s2, b2) = Warc.httpSplit("application/http",
      "HTTP/1.1 200 OK\r\nX: y".getBytes("ISO-8859-1"))
    assert(s2.contains(200) && b2.isEmpty)
    // non-http: payload IS the body, status null
    val (s3, b3) = Warc.httpSplit("text/plain", "raw".getBytes)
    assert(s3.isEmpty && new String(b3, "UTF-8") == "raw")
    // bare-LF header terminator (noncompliant servers, preserved
    // verbatim by WARC): the body must NOT silently vanish
    val (s4, b4) = Warc.httpSplit("application/http",
      "HTTP/1.1 200 OK\nX: y\n\nlf body".getBytes("ISO-8859-1"))
    assert(s4.contains(200) && new String(b4, "UTF-8") == "lf body")
    // mixed: CRLF headers but LFLF terminator
    val (s5, b5) = Warc.httpSplit("application/http",
      "HTTP/1.1 200 OK\r\nX: y\n\nmixed".getBytes("ISO-8859-1"))
    assert(s5.contains(200) && new String(b5, "UTF-8") == "mixed")
  }

  test("structural damage fails loudly: truncated payload, bad version, " +
    "missing Content-Length; empty glob and oversized files pre-flight") {
    val good = render(("https://x/1", "2026-01-01T00:00:00Z", "abcdef"))
    intercept[Exception](Warc.readRecords(
      new ByteArrayInputStream(good.dropRight(12))).toSeq)
    intercept[Warc.WarcError](Warc.readRecords(
      new ByteArrayInputStream("NOT-WARC\r\n".getBytes)).toSeq)
    intercept[Warc.WarcError](Warc.readRecords(new ByteArrayInputStream(
      "WARC/1.0\r\nWARC-Type: response\r\n\r\n".getBytes)).toSeq)
    // a >2GB Content-Length fails loudly before any allocation
    val huge = intercept[Warc.WarcError](Warc.readRecords(new ByteArrayInputStream(
      "WARC/1.0\r\nContent-Length: 3000000000\r\n\r\n".getBytes)).toSeq)
    assert(huge.getMessage.contains("single-record bound"), huge.getMessage)
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_err")
    intercept[Warc.WarcError](Warc.readWarc(spark, s"$dir/none*.warc.gz"))
    java.nio.file.Files.write(dir.resolve("a.warc"), good)
    val err = intercept[Warc.WarcError](
      Warc.readWarc(spark, s"$dir/a.warc", maxFileBytes = 3))
    assert(err.getMessage.contains("ONE task per file"), err.getMessage)
    // plain (non-gzip) WARC reads fine under the sniff
    assert(Warc.readWarc(spark, s"$dir/a.warc").count() == 1)
  }

  test("fixture scan: one task per file; bodies are the synthetic page " +
    "bytes, joinable back to the corpus by uri") {
    val root = Warc.ensurePagesFixture(spark, TestSpark.sfDir)
    val df = Warc.readWarc(spark, s"$root/*.warc.gz")
    // the writer salts into AT MOST 4 shards (empty salt buckets write
    // nothing); the scan is exactly one task per file that exists
    val nFiles = new java.io.File(root).listFiles()
      .count(_.getName.endsWith(".warc.gz"))
    assert(nFiles >= 1 && nFiles <= 4, s"$nFiles shards")
    assert(df.rdd.getNumPartitions == nFiles)
    val docs = graft.Tables(spark, TestSpark.sfDir, "documents")
    val want = graft.operators.Html.syntheticPages(docs)
      .select(concat(lit("https://corpus.local/"), col("lang"), lit("/"),
        col("doc_id")).as("target_uri"), md5(col("html")).as("want_md5"))
    val got = df.filter(col("warc_type") === "response")
      .select(col("target_uri"), md5(col("body")).as("got_md5"))
    assert(got.count() == docs.count())
    val joined = got.join(want, Seq("target_uri"))
    assert(joined.count() == docs.count())
    assert(joined.filter(col("got_md5") =!= col("want_md5")).isEmpty)
    assert(df.select("http_status").distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(200))
  }
}
