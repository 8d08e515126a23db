package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Boilerplate-line removal and the hashed linear quality scorer. */
class CurationOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  test("scriptProfile == plain-Scala Unicode-script counting; dominant " +
    "label honors the tie order") {
    import java.lang.Character.UnicodeScript
    val texts = Seq(
      "latin" -> "the quick brown fox",
      "cyrillic" -> "быстрая лисица",
      "han" -> "敏捷的狐狸",
      "arabic" -> "الثعلب السريع",
      "hangul" -> "빠른 여우",
      "devanagari" -> "तेज लोमड़ी",
      "thai" -> "สุนัขจิ้งจอก",
      "greek" -> "γρήγορη αλεπού",
      "hebrew" -> "השועל המהיר",
      "mixed" -> "hello мир 123",
      "digits" -> "1234 5678",
      "blank" -> "   \n\t ",
      "empty" -> "")
    val got = texts.toDF("id", "text")
      .select(col("id"), TextAnalysis.scriptProfile(col("text")).as("p"))
      .select(col("id"), col("p.*"))
      .collect().map(r => r.getString(0) -> r).toMap
    val fields = Seq(
      "latin_ratio" -> UnicodeScript.LATIN,
      "cyrillic_ratio" -> UnicodeScript.CYRILLIC,
      "han_ratio" -> UnicodeScript.HAN,
      "arabic_ratio" -> UnicodeScript.ARABIC,
      "hangul_ratio" -> UnicodeScript.HANGUL,
      "devanagari_ratio" -> UnicodeScript.DEVANAGARI,
      "thai_ratio" -> UnicodeScript.THAI,
      "greek_ratio" -> UnicodeScript.GREEK,
      "hebrew_ratio" -> UnicodeScript.HEBREW)
    for ((id, text) <- texts) {
      val base = text.filterNot(_.isWhitespace)
      val r = got(id)
      assert(r.getAs[Long]("n_chars") == base.length, s"$id n_chars")
      if (base.nonEmpty) {
        for ((f, s) <- fields)
          assert(r.getAs[Double](f) ==
            base.count(c => UnicodeScript.of(c) == s).toDouble / base.length,
            s"$id $f")
        assert(r.getAs[Double]("digit_ratio") ==
          base.count(c => c >= '0' && c <= '9').toDouble / base.length,
          s"$id digits")
      }
    }
    for (id <- Seq("latin", "cyrillic", "han", "arabic", "hangul",
        "devanagari", "thai", "greek", "hebrew"))
      assert(got(id).getAs[String]("script") == id, id)
    assert(got("mixed").getAs[String]("script") == "latin") // 5+3 latin > 3 cyr
    assert(got("digits").getAs[String]("script") == "other") // no script chars
    assert(got("blank").getAs[String]("script") == "none")
    assert(got("empty").getAs[String]("script") == "none")
  }

  test("langId routes by script: per-script marker argmax, Han kana " +
    "split, single-language script labels, script-qualified und fallbacks") {
    val cases = Seq(
      // latin argmax (en markers hit), and a markerless latin text
      "the quick brown fox and the dog" -> "en",
      "der hund und die katze ist da" -> "de",
      "zxqw vbnm plok" -> "und-Latn",
      // cyrillic argmax: ru markers; uk marker і; markerless
      "быстрая лисица и не на месте" -> "ru",
      "це швидка лисиця і собака" -> "uk",
      "лисица прыгает быстро" -> "und-Cyrl",
      // han: kana present -> ja, pure kanji -> zh
      "敏捷的狐狸跳过了懒狗" -> "zh",
      "素早い狐が犬を飛び越えた" -> "ja",
      // single-language scripts label directly, no marker list needed
      "الثعلب السريع يقفز" -> "ar",
      "빠른 여우가 게으른 개를 뛰어넘는다" -> "ko",
      "तेज लोमड़ी कूदती है" -> "hi",
      "สุนัขจิ้งจอกกระโดดเร็ว" -> "th",
      "η γρήγορη αλεπού πηδά ψηλά" -> "el",
      "השועל המהיר קופץ מעל הכלב" -> "he",
      // dominance ties resolve by the pinned script order: 2 chars each
      // of hangul vs thai -> the earlier entry (hangul) wins
      "빠른 สุ" -> "ko",
      // unrouted: whitespace-only and digit-only
      "   " -> "und",
      "12345 678" -> "und")
    val got = cases.map(_._1).toDF("text")
      .select(col("text"), TextAnalysis.langId(col("text")).as("g"))
      .collect().map(r => r.getString(0) -> r.getString(1))
    assert(got.toSeq == cases)
  }

  test("langIdScored: labels identical to langId; margins on argmax'd " +
    "scripts, ratios on routed ones, 0.0 on ties/und") {
    val texts = Seq(
      "the quick brown fox and the dog", // en, only en markers -> 1.0
      "the dog and the cat of the house de nada", // en 5 vs es 1 -> 4/6
      "der hund und die katze is in the house of x", // de 3 = en 3 -> tie 0.0
      "zxqw vbnm plok", // und-Latn -> 0.0
      "быстрая лисица и не на что это", // ru 4 vs uk 1 -> 3/5
      "敏捷的狐狸跳过了懒狗", // zh: pure-Han ratio 1.0
      "素早い狐が犬を飛び越えた", // ja: Han chars / total < 1
      "빠른 여우가 게으른 개를 뛰어넘는다", // ko: hangul ratio
      "   ", // none -> und 0.0
      "12345 678") // other -> und 0.0
    val got = texts.toDF("text")
      .select(col("text"), TextAnalysis.langIdScored(col("text")).as("g"),
        TextAnalysis.langId(col("text")).as("plain"))
      .collect().map(r => r.getString(0) ->
        ((r.getStruct(1).getString(0), r.getStruct(1).getDouble(1),
          r.getString(2)))).toMap
    // the label NEVER disagrees with langId
    for ((t, (lang, _, plain)) <- got) assert(lang == plain, s"label drift on '$t'")
    assert(got(texts(0))._1 == "en" && got(texts(0))._2 === 1.0)
    assert(got(texts(1))._1 == "en" && got(texts(1))._2 === 4.0 / 6.0)
    // dead tie: de wins by rank (table order), margin 0 — the
    // threshold-side consumer correctly distrusts it
    assert(got(texts(2))._1 == "de" && got(texts(2))._2 === 0.0)
    assert(got(texts(3))._1 == "und-Latn" && got(texts(3))._2 === 0.0)
    assert(got(texts(4))._1 == "ru" && got(texts(4))._2 === 3.0 / 5.0)
    assert(got(texts(5))._1 == "zh" && got(texts(5))._2 === 1.0)
    assert(got(texts(6))._1 == "ja" &&
      got(texts(6))._2 > 0.0 && got(texts(6))._2 < 1.0) // kana dilute Han
    assert(got(texts(7))._1 == "ko" && got(texts(7))._2 === 1.0)
    assert(got(texts(8)) === (("und", 0.0, "und")))
    assert(got(texts(9)) === (("und", 0.0, "und")))
  }

  test("c4LineClean keeps exactly the contract lines; c4PageKeep gates " +
    "sentences/lorem/brace/empty") {
    val text = Seq(
      "This is a fine first sentence.",   // kept
      "menu home about us contact",       // no terminal punctuation
      "Hi there.",                        // < 3 words
      "Please enable JavaScript to view this page.", // javascript tell
      "\"A quoted line can end on its quote.\"",     // closing-quote terminal
      "  padded line survives the trim.  ",          // trimmed, then kept
      "Another good sentence ends here!").mkString("\n")
    val got = Seq(("d", text)).toDF("id", "text")
      .select(TextAnalysis.c4LineClean(col("text")).as("c"))
      .collect().head.getString(0)
    assert(got == Seq(
      "This is a fine first sentence.",
      "\"A quoted line can end on its quote.\"",
      "padded line survives the trim.",
      "Another good sentence ends here!").mkString("\n"))

    def keep(t: String): Boolean =
      Seq(("d", t)).toDF("id", "text")
        .select(TextAnalysis.c4PageKeep(TextAnalysis.c4LineClean(col("text"))))
        .collect().head.getBoolean(0)
    val five = "One good line number one.\nTwo good line number two.\n" +
      "Three good line number three.\nFour good line number four.\n" +
      "Five good line number five."
    assert(keep(five))
    assert(!keep(five.replaceFirst("number one", "lorem ipsum")))
    assert(!keep(five.replaceFirst("number one", "brace { code")))
    assert(!keep("Only four sentences live here. Two. And three. Four."
      .replace(". ", ".\n"))) // 4 sentences < 5
    assert(!keep("menu\nnav\nfooter")) // everything dropped -> empty
    // a page whose KEPT lines pass but raw text had a brace on a
    // DROPPED line: the gate sees only the cleaned text
    assert(keep(five + "\nbrace { here"))
  }

  test("gopherRepetition == plain-Scala mirror; gate fires per rule") {
    val docs = Seq(
      // non-repetitive and LONG (the top-n rules count a frequency-1
      // n-gram, so tiny docs trip them by construction — the paper
      // bounds word count separately via gopherKeep)
      ("plain", "alpha bravo charlie delta echo foxtrot golf hotel india " +
        "juliett kilo lima mike november oscar papa quebec romeo sierra " +
        "tango uniform victor whiskey xray yankee zulu one two three four " +
        "five six seven eight nine ten eleven twelve thirteen fourteen " +
        "fifteen sixteen seventeen eighteen nineteen twenty amber beryl " +
        "coral dune ember"),
      ("duplines", "alpha one\nalpha one\nbeta two\n\ngamma\n\ngamma"),
      ("top2", "alpha beta " + ("gamma delta " * 6).trim),
      ("dupgrams",
        ("one two three four five six seven eight nine ten " * 3).trim),
      ("empty", ""),
      ("short", "one two"))
    val got = docs.toDF("id", "text")
      .select(col("id"), TextAnalysis.gopherRepetition(col("text")).as("g"),
        TextAnalysis.gopherRepetitionKeep(col("text")).as("keep"))
      .select(col("id"), col("g.*"), col("keep"))
      .collect().map(r => r.getString(0) -> r).toMap

    def words(t: String) = t.trim.split("\\s+").toSeq.filter(_.nonEmpty)
    def segs(t: String, sep: String) =
      t.split(sep, -1).toSeq.filter(_.nonEmpty)
    def dupFrac(xs: Seq[String]) =
      if (xs.isEmpty) 0.0 else (xs.size - xs.distinct.size).toDouble / xs.size
    def extra(xs: Seq[String]) = xs.groupBy(identity).values
      .map(g => (g.size - 1).toLong * g.head.length).sum
    def dupCharFrac(xs: Seq[String]) = {
      val tot = xs.map(_.length.toLong).sum
      if (tot == 0) 0.0 else extra(xs).toDouble / tot
    }
    def ngrams(ws: Seq[String], n: Int) =
      if (ws.size < n) Nil else ws.sliding(n).map(_.mkString(" ")).toSeq
    def topChars(xs: Seq[String]) =
      if (xs.isEmpty) 0L
      else {
        val (c, l) = xs.groupBy(identity).toSeq
          .map { case (k, v) => (v.size.toLong, k.length.toLong) }
          .maxBy(identity)
        c * l
      }
    for ((id, text) <- docs) {
      val ws = words(text)
      val stream = ws.map(_.length.toLong).sum + math.max(0, ws.size - 1)
      def f(num: Long, den: Long) = if (den == 0) 0.0 else num.toDouble / den
      val r = got(id)
      assert(r.getDouble(1) == dupFrac(segs(text, "\n")), s"$id dup_line_frac")
      assert(r.getDouble(2) == dupCharFrac(segs(text, "\n")),
        s"$id dup_line_char_frac")
      assert(r.getDouble(3) == dupFrac(segs(text, "\n\n")), s"$id dup_para_frac")
      assert(r.getDouble(4) == dupCharFrac(segs(text, "\n\n")),
        s"$id dup_para_char_frac")
      for ((n, idx) <- (2 to 4).zipWithIndex)
        assert(r.getDouble(5 + idx) == f(topChars(ngrams(ws, n)), stream),
          s"$id top_${n}gram")
      for ((n, idx) <- (5 to 10).zipWithIndex)
        assert(r.getDouble(8 + idx) ==
          math.min(1.0, f(extra(ngrams(ws, n)), stream)), s"$id dup_${n}gram")
    }
    // the gate: plain/empty pass; each salted doc trips its targeted
    // family; a 2-word doc trips the top-2gram rule by construction
    // (its one 2-gram IS the whole stream) — word-count gating is
    // gopherKeep's job, not this signal's
    assert(got("plain").getBoolean(14) && got("empty").getBoolean(14))
    assert(!got("short").getBoolean(14))
    assert(got("short").getDouble(5) == 1.0)
    assert(!got("duplines").getBoolean(14), "dup line/para rules")
    assert(!got("top2").getBoolean(14), "top 2-gram rule")
    assert(!got("dupgrams").getBoolean(14), "dup n-gram rules")
    // ...and the right SIGNALS are the ones over threshold
    assert(got("duplines").getDouble(1) > 0.30)
    assert(got("top2").getDouble(5) > 0.20)
    assert(got("dupgrams").getDouble(13) > 0.10) // dup_10gram
  }

  test("gopherSignals == plain-Scala mirror; gate fires on the right rule") {
    val good = ("the quick brown fox jumps over a lazy dog and runs on " +
      "with more of the fine words in this line for good measure ") * 3
    val docs = Seq(
      ("good", good),
      ("short", "too few words here"),
      ("bullets", (1 to 60).map(i => s"- item $i of the list").mkString("\n")),
      ("ellipsis", (1 to 10).map(i => s"the line $i trails off...").mkString("\n")),
      ("symbols", "the " + Seq.fill(60)("#tag").mkString(" ") +
        " of and to in is on for with"),
      ("numeric", "the " + (1 to 60).map(_.toString).mkString(" ") +
        " of and to in is on for with"))
    val got = docs.toDF("id", "text")
      .select(col("id"), TextAnalysis.gopherSignals(col("text")).as("g"),
        TextAnalysis.gopherKeep(col("text")).as("keep"))
      .select(col("id"), col("g.*"), col("keep"))
      .collect().map(r => r.getString(0) -> r).toMap
    // plain-Scala mirror for every doc
    for ((id, text) <- docs) {
      // Spark's tokens() trims before splitting; mirror that exactly
      val ws2 = text.trim.split("\\s+").toSeq.filter(_.nonEmpty)
      val lines = text.split("\n", -1).toSeq
      val r = got(id)
      assert(r.getLong(1) == ws2.size, s"$id n_words")
      if (ws2.nonEmpty)
        assert(r.getDouble(2) == ws2.map(_.length).sum.toDouble / ws2.size,
          s"$id mean_word_len")
      val nHash = text.count(_ == '#')
      val nEll = (text.length - text.replace("...", "").length) / 3
      if (ws2.nonEmpty)
        assert(r.getDouble(3) == (nHash + nEll).toDouble / ws2.size,
          s"$id symbol_ratio")
      assert(r.getDouble(4) ==
        lines.count(l => l.matches("[-*•].*")).toDouble / lines.size,
        s"$id bullet_frac")
      assert(r.getDouble(5) ==
        lines.count(_.endsWith("...")).toDouble / lines.size, s"$id ell_frac")
      if (ws2.nonEmpty)
        assert(r.getDouble(6) ==
          ws2.count(_.exists(_.isLetter)).toDouble / ws2.size, s"$id alpha")
    }
    // the gate: good passes; each bad doc fails its targeted rule
    assert(got("good").getBoolean(8))
    assert(!got("short").getBoolean(8))    // < 50 words
    assert(!got("bullets").getBoolean(8))  // > 90% bullet lines
    assert(!got("ellipsis").getBoolean(8)) // > 30% ellipsis lines
    assert(!got("symbols").getBoolean(8))  // symbol ratio > 0.1
    assert(!got("numeric").getBoolean(8))  // < 80% alphabetic words
  }

  test("removeBoilerplate strips exactly the >=minDocs lines, in order") {
    // 12 docs share FOOTER (boilerplate at minDocs=10); 5 docs share
    // RARE (below threshold, kept); every doc has a unique body line.
    // Blank lines are structure: never counted, never removed.
    val docs = (0 until 12).map { i =>
      val rare = if (i < 5) "\nRARE" else ""
      (i.toLong, s"body $i\n\nFOOTER$rare")
    }.toDF("id", "t")
    val out = Dedup.removeBoilerplate(docs, "id", "t", minDocs = 10L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out.size == 12)
    for (i <- 0L until 12L) {
      val (nLines, nRemoved, cleanMd5) = out(i)
      val rare = if (i < 5) "\nRARE" else ""
      assert(nLines == (if (i < 5) 4 else 3))
      assert(nRemoved == 1, s"doc $i: only FOOTER is boilerplate")
      assert(cleanMd5 == md5hex(s"body $i\n$rare"))
    }
  }

  test("removeBoilerplate keeps a row for fully-boilerplate docs") {
    val docs = ((0 until 11).map(i => (i.toLong, "SAME")) :+
      (99L, "other")).toDF("id", "t")
    val out = Dedup.removeBoilerplate(docs, "id", "t", minDocs = 10L)
    assert(out.count() == 12)
    val gone = out.filter(col("id") === 0L).collect().head
    assert(gone.getLong(2) == 1 && gone.getString(3) == md5hex(""))
  }

  test("frequentLines returns the audit set behind removeBoilerplate") {
    val docs = (0 until 12).map(i => (i.toLong, s"u$i\nFOOTER")).toDF("id", "t")
    val freq = Dedup.frequentLines(docs, "id", "t", minDocs = 10L).collect()
    assert(freq.length == 1 && freq.head.getLong(1) == 12)
  }

  test("hashClassifierScore is the mean of per-token bucket weights") {
    val df = Seq((1L, "alpha beta alpha")).toDF("id", "t")
    val got = df.select(
      TextAnalysis.hashClassifierScore(col("t"), 64, "s").as("score"))
      .head().getDouble(0)
    val ws = df.select(transform(
        split(trim(col("t")), "\\s+"),
        tok => TextAnalysis.pseudoWeight(TextAnalysis.hash32(tok) % 64, "s"))
      .as("w")).head().getSeq[Long](0)
    assert(ws.length == 3 && ws(0) == ws(2)) // same token -> same bucket
    assert(ws.forall(w => w >= -1000 && w <= 1000))
    assert(got == ws.sum.toDouble / (1000.0 * 3))
  }

  test("hashClassifierScore: empty doc scores 0, score bounded in [-1,1]") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "x y z w v")).toDF("id", "t")
    val rows = df.select(col("id"),
      TextAnalysis.hashClassifierScore(col("t")).as("s")).collect()
    val byId = rows.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(byId(1L) == 0.0 && byId(2L) == 0.0)
    assert(byId(3L) >= -1.0 && byId(3L) <= 1.0 && byId(3L) != 0.0)
  }

  test("ccnetBuckets: per-language terciles, model-like docs land head, " +
    "gibberish lands tail, short docs unscored") {
    // model: clean en text; scored docs range from verbatim-model to
    // fully OOV, per language independently
    val model = "the cat sat on the mat and the dog sat on the rug"
    val docs = Seq(
      (0L, "en", model, true),
      (1L, "en", "the cat sat on the mat", false),
      (2L, "en", "the dog sat on the rug and the cat", false),
      (3L, "en", "dog mat cat rug the on", false),
      (4L, "en", "zq xv qq zz vv xx yy ww", false),
      (5L, "en", "solo", false),
      (10L, "xx", "the cat sat on the mat", false),
      (11L, "xx", "cat the on sat mat rug", false),
      (12L, "xx", "zq xv qq zz vv xx", false))
      .toDF("doc_id", "lang", "text", "ref")
    val out = TextAnalysis.ccnetBuckets(docs, "doc_id", "text", "lang",
        col("ref"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), Option(if (r.isNullAt(2)) null else r.getDouble(2)),
          r.getString(3)))).toMap
    assert(out.size == 9)
    assert(out(5L)._3 == "unscored" && out(5L)._2.isEmpty)
    // verbatim-model text has the lowest ppl of the en cohort -> head;
    // fully-OOV text the highest -> tail
    assert(out(1L)._3 == "head", s"got ${out(1L)}")
    assert(out(4L)._3 == "tail", s"got ${out(4L)}")
    // buckets are PER LANGUAGE: xx's three scored docs split into one
    // per bucket even though their absolute ppls differ from en's
    val xx = Seq(10L, 11L, 12L).map(out(_)._3)
    assert(xx.toSet == Set("head", "middle", "tail"), s"xx buckets $xx")
    // every scored doc got a real bucket
    assert(out.values.forall { case (_, p, b) =>
      (p.isEmpty && b == "unscored") ||
        (p.nonEmpty && Set("head", "middle", "tail")(b)) })
  }
}
