package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** HTML -> text extraction: entity decoding (one-pass, valid-scalar
  * guards), chrome stripping (comments / script / style / CDATA,
  * unclosed forms), tag stripping vs stray `<`, block segmentation with
  * the link-density keep rule — including hostile markup: nested tags,
  * broken close tags, unclosed raw-text elements, marker injection. */
class HtmlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def extract(html: String, minChars: Int = 15,
                      maxLinkDensity: Double = 0.33): String = {
    import spark.implicits._
    Seq(html).toDF("h")
      .select(Html.extractText(col("h"), minChars, maxLinkDensity))
      .head().getString(0)
  }

  private def decode(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("s").select(Html.decodeEntities(col("s"))).head().getString(0)
  }

  test("entity decoding: named set, decimal, hex, one-pass (no rescan), " +
    "invalid scalars stay literal") {
    assert(decode("a &amp; b") == "a & b")
    assert(decode("&lt;tag&gt; &quot;q&quot; &apos;a&apos;") == "<tag> \"q\" 'a'")
    assert(decode("x&nbsp;y") == "x y")
    assert(decode("caf&#233; r&#xE9;sum&#xE9;") == "café résumé")
    assert(decode("&#x1F600;") == new String(Character.toChars(0x1F600)))
    // ONE pass: &amp;#65; is the TEXT "&#65;", never rescanned to "A"
    assert(decode("&amp;#65;") == "&#65;")
    // surrogates / past-max / unknown names stay literal
    assert(decode("&#55296;") == "&#55296;")
    assert(decode("&#1114112;") == "&#1114112;")
    assert(decode("&bogus; &eacute;") == "&bogus; &eacute;")
    // unterminated and over-long bodies are not references at all
    assert(decode("&amp x &#12345678;") == "&amp x &#12345678;")
    // plain text untouched
    assert(decode("no entities here") == "no entities here")
  }

  test("chrome stripping: comments, script/style/noscript with content, " +
    "CDATA — closed, nested-looking, and unclosed-to-EOF") {
    import spark.implicits._
    def chrome(s: String): String =
      Seq(s).toDF("h").select(Html.stripChrome(col("h"))).head().getString(0)
    assert(chrome("a<!-- <p>hidden</p> -->b") == "ab")
    assert(chrome("a<script>if(1<2){x=\"</div>\"}</script>b") == "ab")
    assert(chrome("a<style>p{}</style>b<noscript>n</noscript>c") == "abc")
    assert(chrome("a<![CDATA[ 1<2 ]]>b") == "ab")
    // unclosed forms swallow to end-of-document, never leak code as text
    assert(chrome("a<script>var x = 1;") == "a")
    assert(chrome("a<!-- no close") == "a")
    assert(chrome("a<![CDATA[ no close") == "a")
    // SCRIPT case-insensitive, attributes on the tag
    assert(chrome("a<SCRIPT type=\"x\">s</ScRiPt >b") == "ab")
  }

  test("tag stripping: closed tags, unclosed tag swallows to EOF, " +
    "stray < stays text") {
    import spark.implicits._
    def strip(s: String): String =
      Seq(s).toDF("h").select(Html.stripTags(col("h"))).head().getString(0)
    assert(strip("a<b>c</b>d") == "acd")
    assert(strip("a <span class=\"x") == "a ")
    assert(strip("1 < 2 and <3 hearts") == "1 < 2 and <3 hearts")
    assert(strip("a<!DOCTYPE html>b") == "ab")
  }

  test("block segmentation + link density: nav and footer drop, prose " +
    "keeps; short blocks drop; unclosed anchors are plain text") {
    val html =
      "<html><body>" +
        "<nav><a href=\"/\">Home</a> <a href=\"/x\">Docs</a> hub</nav>" +
        "<p>This paragraph is long enough to keep and has " +
        "<a href=\"/ref\">one small link</a> inside a lot of plain prose text.</p>" +
        "<p>tiny</p>" +
        "<footer><a href=\"/a\">A</a><a href=\"/b\">B</a></footer>" +
        "</body></html>"
    val got = extract(html)
    assert(got == "This paragraph is long enough to keep and has one small " +
      "link inside a lot of plain prose text.")
    // an unclosed anchor's text is NOT link mass: the block survives
    val broken = "<p>An <a href=\"/x\">unclosed anchor swallows nothing " +
      "because its text counts as plain prose here.</p>"
    assert(extract(broken).nonEmpty)
    // inline tags do not split blocks; block tags do
    assert(extract("<p>alpha beta gamma <b>delta</b> epsilon zeta</p>") ==
      "alpha beta gamma delta epsilon zeta")
    assert(extract("<p>alpha beta gamma delta</p><p>epsilon zeta eta theta</p>")
      .count(_ == '\n') == 1)
  }

  test("marker injection: US/RS control bytes in input are stripped, " +
    "never become block/entity boundaries") {
    val evil = "<p>one\u001Etwo words padding padding</p>" +
      "<p>x\u001Famp; y words padding padding</p>"
    val got = extract(evil, minChars = 5)
    assert(got == "onetwo words padding padding\nxamp; y words padding padding")
  }

  test("blocks() exposes per-block text and link mass for auditing") {
    import spark.implicits._
    val html = "<nav><a href=\"/\">Home</a></nav><p>plain body prose</p>"
    val rows = Seq(html).toDF("h")
      .select(explode(Html.blocks(col("h"))).as("b"))
      .select(col("b.text"), col("b.link_chars"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    assert(rows.toSeq == Seq(("Home", 4), ("plain body prose", 0)))
  }

  test("whole synthetic page: chrome gone, entities decoded, nav/footer " +
    "dropped, paragraphs and h1 kept in order") {
    import spark.implicits._
    val docs = graft.Tables(spark, TestSpark.sfDir, "documents").limit(5)
    val out = Html.syntheticPages(docs)
      .select(col("doc_id"), Html.extractText(col("html")).as("t"))
      .collect()
    for (r <- out) {
      val t = r.getString(1)
      assert(t.startsWith(s"Doc ${r.getLong(0)} \"café résumé\" &bogus; &#1114112;"),
        t.take(80))
      assert(!t.contains("Home") && !t.contains("Terms") && !t.contains("tiny"))
      assert(!t.contains("color: red") && !t.contains("alert") &&
        !t.contains("raw junk"))
      assert(t.contains("stray < bracket and an unclosed"))
      // body words survive; the split word "table" itself is consumed
      assert(t.split('\n').length >= 3)
    }
  }

  test("links(): hrefs in document order, entity-decoded, never from " +
    "chrome; unclosed anchors still contribute their href; all three " +
    "quoting styles harvested") {
    import spark.implicits._
    def links(s: String): Seq[String] =
      Seq(s).toDF("h").select(Html.links(col("h"))).head().getSeq[String](0)
    val html = "<script>x = '<a href=\"/evil\">'</script>" +
      "<!-- <a href=\"/hidden\">c</a> -->" +
      "<nav><a href=\"/\">Home</a><a class=\"z\" href=\"/a?x=1&amp;y=2\">A</a></nav>" +
      "<p><a href=\"/open\">unclosed anchor" // no </a>, swallowed tag ok
    assert(links(html) == Seq("/", "/a?x=1&y=2", "/open"))
    assert(links("<p>no anchors at all</p>").isEmpty)
    // single-quoted: harvested, quotes stripped, entities decoded; a
    // double quote inside single quotes is part of the value
    assert(links("<a href='/sq?a=1&amp;b=2'>x</a>") == Seq("/sq?a=1&b=2"))
    assert(links("<a href='/q\"v'>x</a>") == Seq("/q\"v"))
    // unquoted: runs to whitespace or '>'; whitespace around '=' is fine
    assert(links("<a href=/u/plain>x</a> <a href = \"/w\">y</a>") ==
      Seq("/u/plain", "/w"))
    assert(links("<a href=/u/stop next=1>x</a>") == Seq("/u/stop"))
    // empty quoted value survives as the empty string (caller filters)
    assert(links("<a href=\"\">x</a><a href=''>y</a>") == Seq("", ""))
    // mixed styles keep document order
    assert(links("<a href='/1'>a</a><a href=/2>b</a><a href=\"/3\">c</a>") ==
      Seq("/1", "/2", "/3"))
    // an href= SUBSTRING inside another attribute's quoted value is NOT
    // a link (quoted values are consumed atomically before href)...
    assert(links("<a class=x title=\"see href=spam.example for docs\">t</a>")
      .isEmpty)
    assert(links("<a title='use href=/evil here' href=\"/good\">t</a>") ==
      Seq("/good"))
    // ...and neither is a longer attribute name ending in href
    assert(links("<a data-href=\"/shadow\">t</a>").isEmpty)
    assert(links("<a data-href=\"/shadow\" href=\"/real\">t</a>") ==
      Seq("/real"))
  }

  test("plan: pure projection over the scan — no exchange, no UDF") {
    val docs = graft.Tables(spark, TestSpark.sfDir, "documents").limit(20)
    val plan = Html.syntheticPages(docs)
      .select(Html.extractText(col("html")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
  }
}
