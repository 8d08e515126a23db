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

  /** Handcrafted record of any WARC-Type (the engine's renderer only
    * writes responses; real crawls interleave request / revisit /
    * metadata records). */
  private def rawRecord(typ: String, uri: String, payload: Array[Byte],
                        extra: Seq[(String, String)] = Nil): Array[Byte] = {
    val sb = new StringBuilder("WARC/1.0\r\n")
    sb.append(s"WARC-Type: $typ\r\n")
    if (uri != null) sb.append(s"WARC-Target-URI: $uri\r\n")
    for ((k, v) <- extra) sb.append(s"$k: $v\r\n")
    sb.append(s"Content-Length: ${payload.length}\r\n\r\n")
    sb.toString.getBytes(StandardCharsets.ISO_8859_1) ++ payload ++
      "\r\n\r\n".getBytes(StandardCharsets.ISO_8859_1)
  }

  test("mixed record types (request/response/revisit/metadata) in both " +
    "gzip conventions: all surface with warc_type, the response filter " +
    "contract feeds the crawl pipeline") {
    val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      "<p>the quick brown fox and the dog run on with many fine words</p>")
      .getBytes(StandardCharsets.ISO_8859_1)
    val recs = Seq(
      rawRecord("request", "https://m/x",
        "GET /x HTTP/1.1\r\nHost: m\r\n\r\n".getBytes,
        Seq("Content-Type" -> "application/http;msgtype=request")),
      rawRecord("response", "https://m/x", http,
        Seq("Content-Type" -> "application/http;msgtype=response")),
      rawRecord("revisit", "https://m/x", Array.emptyByteArray,
        Seq("WARC-Profile" ->
          "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest")),
      rawRecord("metadata", "https://m/x", "fetchTimeMs: 12\r\n".getBytes,
        Seq("Content-Type" -> "application/warc-fields")))
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_mixed")
    // gzip-per-record members concatenated (the Common Crawl shape)
    val perRec = new java.io.ByteArrayOutputStream()
    for (r <- recs) {
      val gz = new GZIPOutputStream(perRec); gz.write(r); gz.finish()
    }
    java.nio.file.Files.write(dir.resolve("perrec.warc.gz"), perRec.toByteArray)
    // one gzip member for the whole file
    val perFile = new java.io.ByteArrayOutputStream()
    val gz = new GZIPOutputStream(perFile)
    recs.foreach(gz.write); gz.finish()
    java.nio.file.Files.write(dir.resolve("perfile.warc.gz"), perFile.toByteArray)
    val df = Warc.readWarc(spark, s"$dir/*.warc.gz")
    val byType = df.groupBy("warc_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("request" -> 2L, "response" -> 2L,
      "revisit" -> 2L, "metadata" -> 2L))
    // the filter contract: consumers take response+200, and the crawl
    // pipeline (extractText -> langId) runs off the bodies unchanged
    val out = df.filter(col("warc_type") === "response" &&
        col("http_status") === 200)
      .select(graft.operators.Html.extractText(
        col("body").cast("string")).as("text"))
      .select(col("text"),
        graft.operators.TextAnalysis.langId(col("text")).as("lang"))
      .collect()
    assert(out.length == 2)
    assert(out.forall(_.getString(0).startsWith("the quick brown fox")))
    assert(out.forall(_.getString(1) == "en"))
    // request/metadata payloads are bodies too (msgtype=request splits
    // its HTTP headers; warc-fields stays raw)
    assert(df.filter(col("warc_type") === "metadata")
      .select(col("body").cast("string")).head().getString(0)
      .contains("fetchTimeMs"))
  }

  test("WET-shaped conversion records (text/plain, no HTTP message) read " +
    "with the payload as the body and a null status") {
    val wet = rawRecord("conversion", "https://w/1",
      "already-extracted plain text\n".getBytes(StandardCharsets.UTF_8),
      Seq("Content-Type" -> "text/plain"))
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_wet")
    java.nio.file.Files.write(dir.resolve("w.warc"), wet)
    val row = Warc.readWarc(spark, s"$dir/w.warc")
      .select("warc_type", "http_status", "body").head()
    assert(row.getString(0) == "conversion")
    assert(row.isNullAt(1))
    assert(new String(row.getAs[Array[Byte]](2), "UTF-8")
      .startsWith("already-extracted"))
  }

  test("writeWet -> readWarc round-trips conversion records byte-exactly") {
    val s = spark
    import s.implicits._
    val texts = Seq(
      ("https://w/1", "plain text with unicode: café résumé — ☃"),
      ("https://w/2", ""), // empty extraction survives as a zero-length body
      ("https://w/3", "line one\nline two\r\nline three"))
    val dir = java.nio.file.Files.createTempDirectory("graft_wet_rt").toString
    Warc.writeWet(texts.toDF("uri", "txt"), "uri", "txt", dir, files = 2,
      date = "2026-01-01T00:00:00Z")
    val got = Warc.readWarc(spark, s"$dir/*.warc.gz")
      .select("warc_type", "target_uri", "content_type", "http_status", "body")
      .collect()
    assert(got.forall(_.getString(0) == "conversion"))
    assert(got.forall(_.getString(2) == "text/plain"))
    assert(got.forall(_.isNullAt(3))) // no HTTP message to split
    val byUri = got.map(r =>
      r.getString(1) -> new String(r.getAs[Array[Byte]](4), "UTF-8")).toMap
    assert(byUri == texts.toMap)
  }

  test("writeWarcIndexed: per-record gzip members + CDX sidecar; " +
    "fetchRecords point-reads exactly the addressed members; the whole " +
    "shard still streams") {
    val s = spark
    import s.implicits._
    val pages = (0 until 40).map(i => (s"https://c/$i", s"<p>page $i</p>"))
    val dir = java.nio.file.Files.createTempDirectory("graft_cdx").toString
    Warc.writeWarcIndexed(pages.toDF("uri", "html"), "uri", "html",
      dir, files = 3, date = "2026-01-01T00:00:00Z")
    val cdx = Warc.readCdx(spark, dir)
    assert(cdx.count() == 40)
    // offsets + lengths tile each shard exactly (member-per-record)
    for ((fname, rows) <- cdx.collect()
        .groupBy(_.getAs[String]("filename"))) {
      val sorted = rows.sortBy(_.getAs[Long]("offset"))
      var expect = 0L
      for (r <- sorted) {
        assert(r.getAs[Long]("offset") == expect, s"$fname gap")
        expect += r.getAs[Long]("length")
      }
      assert(expect == new java.io.File(dir, fname).length, s"$fname tail")
    }
    // point-read a subset: exactly those documents come back, bodies intact
    val want = cdx.filter(col("url").endsWith("7"))
    val got = Warc.fetchRecords(want, dir)
      .select("target_uri", "http_status", "body").collect()
      .map(r => r.getString(0) ->
        new String(r.getAs[Array[Byte]](2), "UTF-8")).toMap
    assert(got.keySet == pages.map(_._1).filter(_.endsWith("7")).toSet)
    assert(got("https://c/7") == "<p>page 7</p>")
    // the same shards still stream end-to-end through readWarc
    val streamed = Warc.readWarc(spark, s"$dir/part-*.warc.gz")
    assert(streamed.count() == 40)
    assert(streamed.filter(col("http_status") === 200).count() == 40)
  }

  test("truncation: strict mode fails loudly mid-payload; tolerant mode " +
    "emits the partial record flagged warc_truncated='length'; a " +
    "crawler-DECLARED WARC-Truncated header surfaces without error") {
    val whole = render(("https://t/1", "2026-01-01T00:00:00Z", "abcdefgh"),
      ("https://t/2", "2026-01-01T00:00:00Z", "second"))
    val cut = whole.dropRight(40) // inside record 2's payload
    intercept[java.io.EOFException](
      Warc.readRecords(new ByteArrayInputStream(cut)).toSeq)
    val tol = Warc.readRecords(new ByteArrayInputStream(cut),
      tolerateTruncation = true).toSeq
    assert(tol.size == 2)
    assert(!tol.head.headers.contains("warc-truncated"))
    assert(tol(1).headers("warc-truncated") == "length")
    assert(tol(1).payload.length < "second".length + 60)
    // declared truncation: Content-Length matches the stored bytes, so
    // the record parses normally and the reason code rides along
    val declared = rawRecord("response", "https://t/3", "part".getBytes,
      Seq("Content-Type" -> "application/http;msgtype=response",
        "WARC-Truncated" -> "time"))
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_trunc")
    java.nio.file.Files.write(dir.resolve("d.warc"), declared)
    java.nio.file.Files.write(dir.resolve("c.warc"), cut)
    val df = Warc.readWarc(spark, s"$dir/d.warc")
    assert(df.select("warc_truncated").head().getString(0) == "time")
    // the distributed scan honors the flag too
    val tdf = Warc.readWarc(spark, s"$dir/c.warc", tolerateTruncation = true)
    assert(tdf.count() == 2)
    assert(tdf.filter(col("warc_truncated") === "length").count() == 1)
    intercept[org.apache.spark.SparkException](
      Warc.readWarc(spark, s"$dir/c.warc").count())
  }

  test("gzip-level truncation (the shipped-file damage case): strict " +
    "fails loudly, tolerant reads the surviving records") {
    val out = new java.io.ByteArrayOutputStream()
    val gz = new GZIPOutputStream(out)
    gz.write(render(("https://g/1", "2026-01-01T00:00:00Z", "first body"),
      ("https://g/2", "2026-01-01T00:00:00Z", "second body here")))
    gz.finish()
    val whole = out.toByteArray
    val cut = whole.dropRight(18) // inside the deflate stream / trailer
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_gzcut")
    java.nio.file.Files.write(dir.resolve("cut.warc.gz"), cut)
    intercept[org.apache.spark.SparkException](
      Warc.readWarc(spark, s"$dir/cut.warc.gz").count())
    val tol = Warc.readWarc(spark, s"$dir/cut.warc.gz",
      tolerateTruncation = true)
    val rows = tol.select("target_uri", "warc_truncated").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows.contains("https://g/1"), rows)
    // whatever record the cut landed in is either flagged or dropped —
    // never silently emitted whole
    assert(rows.get("https://g/2").forall(_ == "length"), rows)
  }

  test("corrupt headers fail loudly: duplicate or non-numeric " +
    "Content-Length never silently desynchronizes") {
    val dup = ("WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 4\r\n" +
      "Content-Length: 2\r\n\r\nabcd\r\n\r\n").getBytes
    val e1 = intercept[Warc.WarcError](
      Warc.readRecords(new ByteArrayInputStream(dup)).toSeq)
    assert(e1.getMessage.contains("duplicate Content-Length"))
    val bad = "WARC/1.0\r\nContent-Length: abc\r\n\r\n".getBytes
    val e2 = intercept[Warc.WarcError](
      Warc.readRecords(new ByteArrayInputStream(bad)).toSeq)
    assert(e2.getMessage.contains("bad Content-Length"))
  }

  test("httpSplit accepts the mixed LF+CRLF terminator") {
    val (s, b) = Warc.httpSplit("application/http",
      "HTTP/1.1 200 OK\nX: y\n\r\nmixed body".getBytes("ISO-8859-1"))
    assert(s.contains(200) && new String(b, "UTF-8") == "mixed body")
  }

  test("renderResponses rejects control characters in uri/date — header " +
    "injection cannot corrupt an exported archive") {
    val e = intercept[Warc.WarcError](render(
      ("https://x/\r\nContent-Length: 0", "2026-01-01T00:00:00Z", "b")))
    assert(e.getMessage.contains("control character"), e.getMessage)
    intercept[Warc.WarcError](render(
      ("https://ok/", "2026-01-01\n00:00:00Z", "b")))
    // plain high-bit / unicode uri bytes are NOT control chars: allowed
    render(("https://ok/café", "2026-01-01T00:00:00Z", "b"))
  }

  test("writeWarc commits via temp+rename: shards readable, no .tmp " +
    "residue left behind") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_commit")
    val df = Seq(("https://c/1", "<p>a</p>"), ("https://c/2", "<p>b</p>"))
      .toDF("uri", "html")
    Warc.writeWarc(df, "uri", "html", dir.toString, files = 2,
      date = "2026-01-01T00:00:00Z")
    val names = new java.io.File(dir.toString).listFiles().map(_.getName)
    assert(!names.exists(_.endsWith(".tmp")), names.toSeq)
    assert(names.count(_.endsWith(".warc.gz")) >= 1)
    assert(Warc.readWarc(spark, s"$dir/*.warc.gz").count() == 2)
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
