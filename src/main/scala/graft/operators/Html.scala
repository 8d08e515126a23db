package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML -> text extraction: the FIRST stage of a web-corpus pipeline
  * (everything downstream — dedup, language ID, quality scoring,
  * tokenization — assumes plain text; raw crawl data is markup).
  *
  * Shape follows the public boilerplate-removal literature (jusText,
  * Kohlschuetter et al.'s boilerpipe, trafilatura): strip the
  * non-content machinery (comments, script/style/noscript raw-text
  * elements, CDATA), segment into BLOCKS at block-level tag boundaries,
  * score each block by length and LINK DENSITY (share of its text that
  * sits inside anchors — navigation/footer chrome is link-dense, body
  * prose is not), keep the blocks that pass, join with newlines.
  *
  * Engineering: the whole pipeline is composed from Spark's built-in
  * string/array/lambda expressions (regexp_replace / split / transform /
  * filter / aggregate) — scan-level, whole-stage-codegen'd, ZERO
  * exchanges, no UDF, no mapPartitions — so it runs at full scan
  * throughput on 100 TB of crawl shards and Catalyst can push it past
  * joins/filters like any other projection. Every step is deterministic
  * and engine-agnostic (RE2-compatible regexes: no backreferences, no
  * lookaround), so an independent SQL engine reproduces the output
  * byte-for-byte — the DuckDB oracle does exactly that (q125/q126).
  *
  * Defined semantics (the contract, chosen once, mirrored everywhere):
  *   - comments `<!-- .. -->`, then `<script>/<style>/<noscript>`
  *     elements WITH their content, then `<![CDATA[ .. ]]>` sections are
  *     removed; an unclosed opener of any of these swallows to
  *     end-of-document (a parse-robustness rule real extractors share:
  *     a broken `</script` must not leak code into text).
  *   - block-level tags (p, div, h1-h6, li, ul, ol, dl, dt, dd, table,
  *     thead, tbody, tr, td, th, blockquote, pre, section, article,
  *     aside, header, footer, nav, form, figure, figcaption, main, hr,
  *     br, html, head, body, title) mark block boundaries; remaining
  *     tags are inline and vanish without splitting.
  *   - a "tag" is `<` or `</` followed by an ASCII letter or `!` up to
  *     the next `>` (or end-of-document if unclosed). A stray `<` that
  *     opens no tag (`a < b`, `<3`) is TEXT, as in browsers.
  *   - character references decode in ONE left-to-right pass (no
  *     re-scanning, so `&amp;#65;` yields the literal text `&#65;`):
  *     the named set `&amp; &lt; &gt; &quot; &apos;` plus `&nbsp;`
  *     (to a plain space), decimal `&#NNNNNNN;` (<= 7 digits) and hex
  *     `&#xHHHHHH;` (<= 6 digits) for valid scalar values (9, 10, 13,
  *     32..55295, 57344..1114111); anything else stays literal text.
  *   - block text is whitespace-collapsed and trimmed; link text is the
  *     concatenation of CLOSED `<a ..> .. </a>` inner texts (an
  *     unclosed anchor contributes plain text, not link mass).
  *   - keep a block iff `length(text) >= minChars` AND
  *     `linkChars <= maxLinkDensity * length(text)`.
  *
  * No reference counterpart — bearysta ingests structured CSV/SQLite
  * (aggregate.py:306), never raw markup; this extends the engine to the
  * crawl-ingest stage the LLM-pipeline brief starts from.
  */
object Html {

  /** Unit separator: internal marker for entity boundaries. */
  private val US = "\u001F"
  /** Record separator: internal marker for block boundaries. */
  private val RS = "\u001E"

  private val BlockTags =
    "p|div|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tr|td|th|blockquote|" +
      "pre|section|article|aside|header|footer|nav|form|figure|figcaption|" +
      "main|hr|br|html|head|body|title"

  /** One left-to-right character-reference decode pass. The trick that
    * keeps it a pure expression in BOTH engines: wrap every reference
    * body in US markers, split on US (so odd positions are exactly the
    * reference bodies), decode each body positionally, re-join. Split
    * never loses empties (limit -1), so concatenation is lossless. */
  def decodeEntities(text: Column): Column = {
    val marked = regexp_replace(text,
      "&(#[0-9]{1,7}|#[xX][0-9a-fA-F]{1,6}|amp|lt|gt|quot|apos|nbsp);",
      US + "$1" + US)
    val parts = split(marked, US, -1)
    val decoded = transform(parts, (p, i) =>
      when(i % 2 === 1, decodeBody(p)).otherwise(p))
    array_join(decoded, "")
  }

  /** Decode one reference body ("amp", "#65", "#x1F600"): named map, or
    * numeric -> the code point when it is a valid scalar value
    * (surrogates and out-of-range stay literal `&body;`). format_string
    * "%c" is Java's code-point formatter — full Unicode, unlike Spark's
    * chr() which wraps mod 256. */
  private def decodeBody(p: Column): Column = {
    val isHex = p.rlike("^#[xX]")
    val isNum = p.startsWith("#")
    val code = when(isHex, conv(substring(p, 3, 6), 16, 10).cast("long"))
      .otherwise(when(isNum && !isHex, substring(p, 2, 7).cast("long")))
    val valid = code === 9 || code === 10 || code === 13 ||
      (code >= 32 && code <= 55295) || (code >= 57344 && code <= 1114111)
    when(isNum,
      when(valid, format_string("%c", code.cast("int")))
        .otherwise(concat(lit("&"), p, lit(";"))))
      .otherwise(
        when(p === "amp", "&").when(p === "lt", "<").when(p === "gt", ">")
          .when(p === "quot", "\"").when(p === "apos", "'")
          .when(p === "nbsp", " ")
          .otherwise(concat(lit("&"), p, lit(";"))))
  }

  /** Remove non-content machinery: comments, script/style/noscript
    * elements with their content, CDATA sections — each unclosed form
    * swallowing to end-of-document. Also strips any pre-existing
    * US/RS control bytes so the internal markers cannot be injected. */
  def stripChrome(html: Column): Column = {
    val clean0 = regexp_replace(html, "[\u001E\u001F]", "")
    val noComment = regexp_replace(clean0, "(?s)<!--.*?(-->|$)", "")
    val noScript = regexp_replace(noComment,
      "(?is)<script\\b[^>]*(>.*?(</script\\s*>|$)|$)", "")
    val noStyle = regexp_replace(noScript,
      "(?is)<style\\b[^>]*(>.*?(</style\\s*>|$)|$)", "")
    val noNoscript = regexp_replace(noStyle,
      "(?is)<noscript\\b[^>]*(>.*?(</noscript\\s*>|$)|$)", "")
    regexp_replace(noNoscript, "(?s)<!\\[CDATA\\[.*?(\\]\\]>|$)", "")
  }

  /** Drop every remaining tag (closed, or unclosed-to-EOF); stray `<`
    * that opens no tag survives as text. */
  def stripTags(html: Column): Column =
    regexp_replace(html, "(?s)</?[a-zA-Z!][^>]*(>|$)", "")

  /** Whitespace-collapse + trim (the block-text normal form). The class
    * is spelled out (== Java's \s) because RE2's \s omits \x0B — the
    * explicit class is byte-identical across engines by construction. */
  private def norm(c: Column): Column =
    trim(regexp_replace(c, "[ \\t\\n\\x0B\\f\\r]+", " "))

  /** Raw block html -> visible text: tags out, one entity pass,
    * whitespace normalized. */
  private def blockText(b: Column): Column = norm(decodeEntities(stripTags(b)))

  /** Character count of CLOSED-anchor inner text within a raw block. */
  private def linkChars(b: Column): Column = {
    val inner = regexp_extract_all(b, lit("(?is)<a\\b[^>]*>(.*?)</a\\s*>"), lit(1))
    aggregate(transform(inner, l => length(blockText(l))), lit(0),
      (acc, x) => acc + x)
  }

  /** Per-block view: array of (text, link_chars) structs in document
    * order, empty blocks dropped — the instrumented form `extractText`
    * filters, exposed for auditing keep/drop decisions. */
  def blocks(html: Column): Column = {
    val segmented = regexp_replace(stripChrome(html),
      s"(?is)</?($BlockTags)\\b[^>]*(>|$$)", RS)
    val arr = split(segmented, RS, -1)
    filter(
      transform(arr, b =>
        struct(blockText(b).as("text"), linkChars(b).as("link_chars"))),
      s => length(s.getField("text")) > 0)
  }

  /** THE keep rule, on one `blocks()` struct — the single definition
    * both [[extractText]] and any audit query (q126) share, so the
    * instrumented keep/drop accounting can never drift from the filter
    * it audits. */
  def keeps(block: Column, minChars: Int = 15,
            maxLinkDensity: Double = 0.33): Column = {
    require(minChars >= 1, "minChars must be >= 1")
    require(maxLinkDensity >= 0 && maxLinkDensity <= 1,
      s"maxLinkDensity in [0,1], got $maxLinkDensity")
    length(block.getField("text")) >= minChars &&
      block.getField("link_chars") <=
        lit(maxLinkDensity) * length(block.getField("text"))
  }

  /** The headline operator: extracted main text of an HTML document —
    * kept blocks joined with newlines. */
  def extractText(html: Column, minChars: Int = 15,
                  maxLinkDensity: Double = 0.33): Column = {
    val kept = filter(blocks(html), s => keeps(s, minChars, maxLinkDensity))
    array_join(transform(kept, _.getField("text")), "\n")
  }

  /** Hyperlink harvest — the crawl-frontier extraction: every href
    * value of an `<a>` tag in ALL THREE legal quoting styles
    * (`href="…"`, `href='…'`, and unquoted `href=…` running to the
    * first whitespace / quote / `>`), in document order, entity-decoded
    * (`href="a&amp;b"` is the URL `a&b`). Chrome is stripped first so
    * links inside comments/scripts never leak into the frontier.
    * Tag-level, not anchor-closure-level: an unclosed `<a href="x">`
    * still contributes its href (its TEXT is what loses link status,
    * see [[extractText]]). The attribute region before `href` is
    * scanned with quoted values consumed ATOMICALLY
    * (`(?:[^>"']|"[^"]*"|'[^']*')*?`) and `href` must follow
    * whitespace, so an `href=` SUBSTRING inside another attribute's
    * quoted value (`title="see href=x"`) or a longer attribute name
    * (`data-href`) can never pollute the frontier. Whitespace is the
    * explicit Java-`\s` class, RE2-identical by construction. Compose
    * with `TextAnalysis.canonicalUrl` + the domain blocklist for the
    * full frontier pipeline. */
  def links(html: Column): Column = {
    val ws = "[ \\t\\n\\x0B\\f\\r]"
    val raw = regexp_extract_all(stripChrome(html),
      lit(s"(?is)<a\\b(?:[^>\"']|\"[^\"]*\"|'[^']*')*?${ws}href$ws*=$ws*" +
        "(\"[^\"]*\"|'[^']*'|[^ \\t\\n\\x0B\\f\\r\"'>]+)"), lit(1))
    transform(raw, v => decodeEntities(
      when(v.rlike("^[\"']"), v.substr(lit(2), length(v) - 2)).otherwise(v)))
  }

  /** Deterministic HTML-page fixture over the documents table: wraps
    * each doc's text in a realistic page — head with title/style/script
    * (including `<` and quotes inside code), a comment, a link-dense
    * nav, paragraphs cut at the word "table", entities of every decode
    * class (named, decimal, hex, invalid), a too-short block, CDATA, a
    * link-dense footer, a broken unclosed tag. Built from concat/replace
    * only, so the DuckDB oracle rebuilds the IDENTICAL bytes. */
  def syntheticPages(docs: org.apache.spark.sql.DataFrame)
  : org.apache.spark.sql.DataFrame = {
    val body = regexp_replace(col("text"), " table ", "</p><p>")
    val page = concat(
      lit("<!DOCTYPE html><html><head><title>Doc "), col("doc_id"),
      lit("</title><style>p { color: red }</style>" +
        "<script>if (1<2) { x = \"a&amp;b\"; }</script></head>" +
        "<body><!-- page "), col("doc_id"),
      lit(" --><nav><a href=\"/\">Home</a> <a href=\"/a\">About</a> " +
        "<a href=\"/b\">More &amp; more</a> " +
        "<a href='/s?a=1&amp;b=2'>S</a> <a href=/u/plain>U</a></nav><h1>Doc "),
      col("doc_id"),
      lit(" &quot;caf&#233; r&#xE9;sum&#xE9;&quot; &bogus; &#1114112;</h1><p>"),
      body,
      lit("</p><p>tiny</p><![CDATA[ raw junk 1<2 ]]>" +
        "<footer><a href=\"/terms\">Terms</a> &copy; <a href=\"/p\">P</a> " +
        "<a href=\"HTTPS://Ex"), col("doc_id") % 5,
      lit(".COM:443/P?utm_source=x&amp;q=1#f\">ext</a>" +
        "</footer><p>tail block with a stray < bracket and an unclosed " +
        "<span class=\"x"))
    docs.select(col("doc_id"), col("lang"), page.as("html"))
  }
}
