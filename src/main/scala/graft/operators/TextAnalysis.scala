package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Text-analysis primitives for large-scale document pipelines: token
  * counting, shingling, canonical fingerprinting, quality scoring and a
  * marker-word language-ID heuristic.
  *
  * Everything here is a pure `Column` expression (whole-stage codegen'd,
  * no UDFs), so filters composed with these push down and the operators
  * scale linearly with input splits — no shuffle is introduced by any
  * function in this object.
  */
object TextAnalysis {

  /** Whitespace tokenization; matches DuckDB
    * `string_split_regex(trim(text), '\s+')`. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text)).cast(LongType)

  /** Word n-gram shingles (space-joined), 1-based windows like the SQL
    * `ws[i] || ' ' || ws[i+1] ...` idiom; distinct set. Documents shorter
    * than n tokens yield an empty set (guard needed because Spark's
    * `sequence(1, x)` runs DESCENDING when x < 1, unlike SQL `range`). */
  def wordShingles(text: Column, n: Int): Column =
    // let-bind the token array: without it Catalyst inlines the regex
    // split into every element_at inside the lambda (n+2 evaluations per
    // shingle — dominates the whole dedup pipeline)
    graft.functions.bound(tokens(text)) { ws =>
      val joined = transform(
        sequence(lit(1), size(ws) - lit(n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(ws, i + lit(o))): _*))
      // CaseWhen evaluates lazily per row, so the descending sequence never
      // runs for short docs.
      when(size(ws) < n, array().cast("array<string>"))
        .otherwise(array_distinct(joined))
    }

  /** BPE-ish subword tokens: a GPT-2-style regex over word / digit /
    * punctuation classes (digits split individually, optional leading
    * space glued to the token). Deterministic, model-free approximation
    * for token-count budgeting — the FAST path when no merges table is
    * at hand; [[bpeTokenCountExact]] is the exact path. */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(" ?[a-z]+| ?[0-9]| ?[^ a-z0-9]+"), lit(0))

  def bpeTokenCount(text: Column): Column = size(bpeTokens(text)).cast(LongType)

  /** EXACT BPE token count under a real merges table (GPT-2 greedy-merge
    * semantics — [[graft.expressions.BpeCodec]]): GPT-2 pre-tokens
    * (the published pre-tokenizer regex, leading space KEPT — so the
    * `Ġ`-prefixed merges that dominate a real merges.txt fire exactly
    * as in the published tokenizer) -> byte-level symbols (GPT-2's
    * bytes->unicode alphabet) -> lowest-ranked adjacent pair merged
    * (all occurrences, left-greedy) until fixpoint; count surviving
    * symbols. The table rides the plan as a GPT-2-format string
    * literal, so a public `merges.txt` drops in via [[bpeLoadMerges]];
    * [[bpeTrain]] learns one from a corpus slice. Scan-level, zero
    * exchanges. */
  def bpeTokenCountExact(text: Column, merges: Seq[(String, String)]): Column =
    call_function("graft_bpe_count", text,
      lit(graft.expressions.BpeCodec.formatMerges(merges)))

  /** FULL exact BPE encode: the token (byte-level symbol string)
    * sequence of `text` under a real merges table, in document order —
    * `size(bpeTokensExact(t, m)) == bpeTokenCountExact(t, m)` by
    * construction. Map through a vocab table (broadcast literal or
    * join) for integer ids. Scan-level, zero exchanges. */
  def bpeTokensExact(text: Column, merges: Seq[(String, String)]): Column =
    call_function("graft_bpe_tokens", text,
      lit(graft.expressions.BpeCodec.formatMerges(merges)))

  /** Exact BPE encode to INTEGER ids under a (merges, vocab) pair —
    * vocab in the public GPT-2 `encoder.json` shape (token -> id);
    * unvocabed tokens -> -1. A published model's tokenizer files drop
    * in via [[bpeLoadMerges]] + `BpeCodec.parseVocabJson`. */
  def bpeIdsExact(text: Column, merges: Seq[(String, String)],
                  vocab: Seq[(String, Int)]): Column =
    call_function("graft_bpe_ids", text,
      lit(graft.expressions.BpeCodec.formatMerges(merges)),
      lit(graft.expressions.BpeCodec.formatVocabJson(vocab)))

  /** Parse a GPT-2-format merges file's CONTENT (one "left right" pair
    * per line, rank = order, `#` headers skipped). */
  def bpeLoadMerges(content: String): Seq[(String, String)] =
    graft.expressions.BpeCodec.parseMerges(content).toSeq

  /** SentencePiece-convention encode to final piece strings
    * ([[graft.expressions.SpCodec]]): Metaspace pre-tokens, character
    * alphabet, the same greedy merge loop as GPT-2. Scan-level, zero
    * exchanges. */
  def spTokensExact(text: Column, merges: Seq[(String, String)]): Column =
    call_function("graft_sp_tokens", text,
      lit(graft.expressions.BpeCodec.formatMerges(merges)))

  /** SentencePiece-convention encode to INTEGER ids with `<0xNN>` byte
    * fallback for out-of-vocab symbols — with
    * [[graft.expressions.SpCodec.canonicalSpVocab]] every text encodes
    * (no unk). Scan-level, zero exchanges. */
  def spIdsExact(text: Column, merges: Seq[(String, String)],
                 vocab: Seq[(String, Int)]): Column =
    call_function("graft_sp_ids", text,
      lit(graft.expressions.BpeCodec.formatMerges(merges)),
      lit(graft.expressions.BpeCodec.formatVocabJson(vocab)))

  /** GPT-2's pre-tokenizer alone ([[graft.expressions.BpeCodec
    * .preTokenize]]): the pre-token strings of `text` in document
    * order, leading spaces kept (" world" is ONE pre-token). The unit
    * every exact-BPE operator and [[bpeTrain]] share. */
  def bpePreTokens(text: Column): Column =
    call_function("graft_bpe_pretokens", text)

  /** Read a small driver-side tokenizer artifact (merges.txt /
    * encoder.json — KB-to-MB scale, versioned files) from any
    * Hadoop-visible path (local, HDFS, object store). Bounded at 64 MB:
    * a "merges file" bigger than that is a mis-pointed glob, and the
    * content rides the PLAN as a literal, so it must stay broadcast-
    * sized. */
  private def readSmallFile(spark: org.apache.spark.sql.SparkSession,
                            path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(p).getLen
    require(len <= (64L << 20),
      s"$path is $len bytes — tokenizer artifacts ride the plan as " +
        "literals and must stay broadcast-sized (<= 64 MB)")
    val in = fs.open(p)
    try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Load a GPT-2 `merges.txt` from a Hadoop-visible path — the drop-in
    * hook for a published model's tokenizer ([[bpeTokenCountExact]] /
    * [[bpeTokensExact]] / [[bpeIdsExact]] take the result directly). */
  def bpeLoadMergesFile(spark: org.apache.spark.sql.SparkSession,
                        path: String): Seq[(String, String)] =
    bpeLoadMerges(readSmallFile(spark, path))

  /** Load a GPT-2 `encoder.json` vocab from a Hadoop-visible path, in
    * [[bpeIdsExact]]'s (token, id) shape. */
  def bpeLoadVocabFile(spark: org.apache.spark.sql.SparkSession,
                       path: String): Seq[(String, Int)] = {
    import scala.jdk.CollectionConverters._
    graft.expressions.BpeCodec.parseVocabJson(readSmallFile(spark, path))
      .asScala.toSeq.map { case (t, id) => (t, id.intValue) }.sortBy(_._2)
  }

  /** Learn a BPE merges table from a corpus slice (Sennrich et al. 2016
    * training): aggregate GPT-2 pre-token frequencies ([[bpePreTokens]]
    * — the same segmentation the encoder uses, leading spaces kept),
    * seed each pre-token as GPT-2's byte-level symbols (the same
    * bytes->unicode alphabet, so trained tables and public merges.txt
    * files are interchangeable), repeatedly merge the
    * pair with the highest occurrence count weighted by word frequency
    * (lexicographically smallest pair on ties — fully deterministic),
    * stop at `numMerges` or when no pair repeats.
    *
    * Scale posture: the DISTRIBUTED part is one word-frequency aggregate
    * over the slice; the merge loop itself runs driver-side over the
    * top-`maxWords` vocabulary (EAGER — this method runs a job when
    * called). That bound is the honest contract: BPE training is a
    * bounded reference phase over a vocabulary (the GPT-2 vocab itself
    * is 50k entries), not a corpus-scale scan; ENCODING with the learned
    * table is the scan-scale operation. */
  def bpeTrain(df: DataFrame, textCol: String, numMerges: Int,
               maxWords: Int = 1 << 16,
               onWarn: String => Unit = m =>
                 System.err.println(s"[WARNING] $m")): Seq[(String, String)] = {
    import graft.expressions.BpeCodec.splitByteLevel
    val wordFreqs = df.select(explode(bpePreTokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
    val freqs = wordFreqs
      .orderBy(col("c").desc, col("w").asc).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // no-silent-caps: a full top-maxWords table means the cap MAY have
    // bound — one count over the (already shuffled) aggregate says by
    // how much. Standard trainer practice to truncate (GPT-2's own
    // vocab is 50k), but the caller gets told, with the dropped
    // fraction, instead of a silently thinner merge table.
    if (freqs.length == maxWords) {
      val nDistinct = wordFreqs.count()
      if (nDistinct > maxWords)
        onWarn(f"bpeTrain: pre-token vocabulary truncated to the top " +
          f"$maxWords of $nDistinct distinct pre-tokens " +
          f"(${(nDistinct - maxWords) * 100.0 / nDistinct}%.1f%% of the " +
          "tail dropped) — raise maxWords to train on the full vocabulary")
    }
    val words = freqs.map { case (w, c) => (splitByteLevel(w), c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var go = true
    while (go && merges.length < numMerges) {
      val pairs = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, c) <- words; i <- 0 until syms.length - 1)
        pairs.updateWith((syms(i), syms(i + 1)))(p => Some(p.getOrElse(0L) + c))
      val mx = if (pairs.isEmpty) 0L else pairs.valuesIterator.max
      if (mx < 2) go = false
      else {
        val (a, b) = pairs.iterator.filter(_._2 == mx).map(_._1).min
        merges += ((a, b))
        for (j <- words.indices) {
          val syms = words(j)._1
          val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
              out += a + b; i += 2
            } else { out += syms(i); i += 1 }
          }
          words(j) = (out, words(j)._2)
        }
      }
    }
    merges.toSeq
  }

  /** WordPiece encode to piece strings ([[graft.expressions.WpCodec]]:
    * greedy longest-match-first over the vocab, `##` continuations,
    * whole-word `[UNK]` on any dead end). `vocab` is ordered vocab.txt
    * lines — published BERT vocab files drop in. Scan-level, zero
    * exchanges. */
  def wordPieceTokens(text: Column, vocab: Seq[String]): Column =
    call_function("graft_wp_tokens", text, lit(vocab.mkString("\n")))

  /** WordPiece encode to vocab.txt LINE ids (the BERT convention);
    * `[UNK]` absent from the vocab yields -1. */
  def wordPieceIds(text: Column, vocab: Seq[String]): Column =
    call_function("graft_wp_ids", text, lit(vocab.mkString("\n")))

  /** Learn a WordPiece vocabulary from a corpus slice — the published
    * likelihood-driven trainer (Schuster & Nakajima 2012; the
    * HF-tokenizers WordPiece trainer): aggregate whitespace-word
    * frequencies ([[tokens]] — the same pre-tokenization
    * [[wordPieceTokens]] uses), seed each word as its codepoint
    * symbols (first plain, rest `##`-marked), then repeatedly merge
    * the adjacent pair maximizing `freq(pair) / (freq(a) * freq(b))` —
    * the WordPiece score, the defining contrast with BPE's raw
    * frequency. Score comparison is EXACT integer cross-multiplication
    * over BigInt (no float ladders — fully deterministic), ties break
    * to the lexicographically smallest pair, pairs must repeat
    * (count >= 2), and a merge whose product would START with the
    * literal `##` marker as an INITIAL symbol is skipped (the marker
    * is positional — such a piece could never match; the published
    * convention's ambiguity, resolved by exclusion). Returns the
    * ordered vocab.txt lines: `[UNK]`, the alphabet (sorted), then
    * merge products in creation order.
    *
    * Scale posture = [[bpeTrain]]'s: ONE distributed word-frequency
    * aggregate (EAGER — runs a job), driver-side merge loop over the
    * top-`maxWords` vocabulary with the same loud truncation
    * warning. */
  /** Unigram-LM Viterbi encode ([[graft.expressions.UgCodec]]) to
    * `STRUCT(pieces, ids, score_micro)`; `vocab` lines are the
    * published SentencePiece `.vocab` dump (`piece<TAB>logprob`). */
  def unigramEncode(text: Column, vocab: Seq[String]): Column =
    call_function("graft_ug_encode", text, lit(vocab.mkString("\n")))

  /** Learn a canonical unigram vocabulary from a corpus — a DECLARED
    * maximum-likelihood substring estimate (the seed step of Kudo
    * 2018's trainer, without the EM prune loop): count every
    * word-internal substring of 1..`maxPieceLen` codepoints weighted
    * by word frequency, keep every observed single codepoint (the
    * totality floor) plus the top multi-codepoint substrings by
    * `(count desc, piece asc)` up to `pieces` entries, and assign each
    * kept piece `lp = ln(count / Σ kept counts)` rendered at 6
    * decimals (the `.vocab` convention — parse-exact on any engine).
    * Output lines are ordered `(count desc, piece asc)` = line ids.
    *
    * Scale shape: the substring explode is scan-level (≤ 32·maxPieceLen
    * values per word), the count aggregate is map-side combined, and
    * ONLY the model-sized top-K is collected (TakeOrdered — the
    * [[wordPieceTrain]] posture, loud bound `pieces ≤ 4096`). */
  def unigramVocabTrain(df: DataFrame, textCol: String, pieces: Int = 96,
                        maxPieceLen: Int = 6): Seq[String] = {
    require(pieces >= 2 && pieces <= 4096,
      s"pieces must be in [2, 4096], got $pieces")
    require(maxPieceLen >= 1 && maxPieceLen <= 8,
      s"maxPieceLen must be in [1, 8], got $maxPieceLen")
    val words = df.select(explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
    val subs = words.select(col("c"), explode(flatten(
        transform(sequence(lit(1), length(col("w"))), s =>
          transform(
            sequence(lit(1), least(lit(maxPieceLen),
              length(col("w")) - s + 1)),
            l => substring(col("w"), s, l))))).as("p"))
      .groupBy("p").agg(sum(col("c")).as("n"))
    val singles = subs.filter(length(col("p")) === 1)
    val multis = subs.filter(length(col("p")) > 1)
      .orderBy(col("n").desc, col("p").asc)
    val singleRows = singles.collect().map(r => (r.getString(0), r.getLong(1)))
    require(singleRows.length <= pieces,
      s"unigramVocabTrain: ${singleRows.length} distinct codepoints " +
        s"exceed the $pieces-piece budget — raise `pieces`")
    val multiRows = multis.limit(pieces - singleRows.length)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val kept = (singleRows ++ multiRows)
      .sortBy { case (p, n) => (-n, p) }
    val total = kept.map(_._2).sum.toDouble
    kept.map { case (p, n) => f"$p\t${math.log(n / total)}%.6f" }.toSeq
  }

  def wordPieceTrain(df: DataFrame, textCol: String, numMerges: Int,
                     maxWords: Int = 1 << 16,
                     onWarn: String => Unit = m =>
                       System.err.println(s"[WARNING] $m")): Seq[String] = {
    val wordFreqs = df.select(explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
    val freqs = wordFreqs
      .orderBy(col("c").desc, col("w").asc).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    if (freqs.length == maxWords) {
      val nDistinct = wordFreqs.count()
      if (nDistinct > maxWords)
        onWarn(f"wordPieceTrain: word vocabulary truncated to the top " +
          f"$maxWords of $nDistinct distinct words " +
          f"(${(nDistinct - maxWords) * 100.0 / nDistinct}%.1f%% of the " +
          "tail dropped) — raise maxWords to train on the full vocabulary")
    }
    def symsOf(w: String): ArrayBufferSyms = {
      val out = new scala.collection.mutable.ArrayBuffer[String]
      var i = 0
      var first = true
      while (i < w.length) {
        val n = Character.charCount(w.codePointAt(i))
        val c = w.substring(i, i + n)
        out += (if (first) c else "##" + c)
        first = false
        i += n
      }
      out
    }
    val words = freqs.map { case (w, c) => (symsOf(w), c) }
    val alphabet = words.iterator.flatMap(_._1).toSet
    val vocab = scala.collection.mutable.ArrayBuffer.empty[String]
    vocab += graft.expressions.WpCodec.Unk
    vocab ++= alphabet.toSeq.sorted
    var go = true
    var added = 0
    while (go && added < numMerges) {
      val pairs = scala.collection.mutable.HashMap.empty[(String, String), Long]
      val symFreq = scala.collection.mutable.HashMap.empty[String, Long]
      for ((syms, c) <- words) {
        for (s <- syms) symFreq.updateWith(s)(p => Some(p.getOrElse(0L) + c))
        for (i <- 0 until syms.length - 1)
          pairs.updateWith((syms(i), syms(i + 1)))(p => Some(p.getOrElse(0L) + c))
      }
      // exact score comparison: pc/(fa*fb) compared by BigInt
      // cross-multiplication — no float ladder can reorder merges
      def product(a: String, b: String) = a + b.stripPrefix("##")
      val candidates = pairs.iterator.filter { case ((a, b), pc) =>
        pc >= 2 && !(a.take(2) != "##" && product(a, b).startsWith("##"))
      }.toSeq
      if (candidates.isEmpty) go = false
      else {
        val pairOrd = Ordering.Tuple2[String, String]
        val best = candidates.reduceLeft { (x, y) =>
          val ((xa, xb), xpc) = x
          val ((ya, yb), ypc) = y
          // xpc/(f(xa)f(xb)) vs ypc/(f(ya)f(yb)), cross-multiplied
          val xs = BigInt(xpc) * BigInt(symFreq(ya)) * BigInt(symFreq(yb))
          val ys = BigInt(ypc) * BigInt(symFreq(xa)) * BigInt(symFreq(xb))
          if (xs > ys) x
          else if (ys > xs) y
          else if (pairOrd.lteq((xa, xb), (ya, yb))) x
          else y
        }
        val (a, b) = best._1
        val merged = product(a, b)
        vocab += merged
        added += 1
        for (j <- words.indices) {
          val syms = words(j)._1
          val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
              out += merged; i += 2
            } else { out += syms(i); i += 1 }
          }
          words(j) = (out, words(j)._2)
        }
      }
    }
    vocab.toSeq
  }
  private type ArrayBufferSyms = scala.collection.mutable.ArrayBuffer[String]

  /** Polynomial rolling hash over the token stream:
    * h = fold(tokens, 0, (acc, t) -> (acc*31 + hash32(t)) mod 1e9+7).
    * Order-sensitive (unlike the set-based [[fingerprint]]) — reordered
    * documents get different fingerprints. All intermediates < 2^63, so
    * the identical value is reproducible in engines that error on BIGINT
    * overflow. */
  def rollingFingerprint(text: Column): Column =
    aggregate(transform(tokens(text), t => hash32(t)), lit(0L),
      (acc, h) => (acc * 31L + h) % 1000000007L)

  /** Canonical document fingerprint: lowercase, strip non-alphanumerics to
    * spaces, collapse whitespace, md5. Two documents with the same
    * fingerprint are exact duplicates modulo case/punctuation/spacing. */
  def fingerprint(text: Column): Column =
    md5(normalize(text))

  /** The normalization underlying [[fingerprint]]. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** 64-bit-ish (60-bit, sign-safe) deterministic string hash via md5 —
    * identical to DuckDB `('0x' || substr(md5(s), 1, 15))::BIGINT`. */
  def hash60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast(LongType)

  /** 32-bit variant (fits comfortably in bit arithmetic both engines do
    * exactly): `('0x' || substr(md5(s), 1, 8))::BIGINT`. */
  def hash32(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast(LongType)

  /** Ratio of characters in `text` matching `pattern` (a single-char
    * regex class), in double precision. */
  private def charClassRatio(text: Column, pattern: String): Column = {
    val total = length(text).cast(DoubleType)
    val kept = length(regexp_replace(text, pattern, "")).cast(DoubleType)
    when(total === 0, 0.0).otherwise((total - kept) / total)
  }

  def punctRatio(text: Column): Column =
    charClassRatio(text, "[\\p{Punct}]")

  def alphaRatio(text: Column): Column =
    charClassRatio(text, "[a-zA-Z]")

  def whitespaceRatio(text: Column): Column =
    charClassRatio(text, "[ \\t\\n]")

  /** Default English-ish stopword markers used by quality scoring and the
    * language-ID heuristic (deterministic, dictionary-free). */
  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  /** Fraction of tokens that are stopwords. */
  def stopwordRatio(text: Column): Column =
    graft.functions.bound(tokens(text))(stopwordRatioOf)

  private def stopwordRatioOf(ts: Column): Column = {
    val hits = size(filter(ts, t => t.isin(stopwords: _*))).cast(DoubleType)
    when(size(ts) === 0, 0.0).otherwise(hits / size(ts).cast(DoubleType))
  }

  /** Composite quality score in [0,1]: rewards mid-length documents with
    * high alpha ratio, some stopwords and low punctuation — the classic
    * cheap pre-filter for web-scale training corpora. Deterministic
    * arithmetic only (no RNG, no model). */
  def qualityScore(text: Column): Column =
    graft.functions.bound(tokens(text)) { ws =>
      val nTok = size(ws).cast(DoubleType)
      val lengthTerm = least(nTok / lit(64.0), lit(1.0))
      val alphaTerm = alphaRatio(text)
      val stopTerm = least(stopwordRatioOf(ws) * 4.0, lit(1.0))
      val punctPenalty = least(punctRatio(text) * 4.0, lit(1.0))
      round((lengthTerm + alphaTerm + stopTerm) / 3.0 * (lit(1.0) - punctPenalty * 0.5), 6)
    }

  /** The published Gopher quality-rule signals (Rae et al. 2021 §A1.1)
    * as one struct column — the de-facto standard web-corpus gate that
    * [[qualityScore]] approximates with a composite. Expression-only
    * (no UDF, no shuffle), every ratio a single IEEE divide over exact
    * integer counts:
    *
    *   - `n_words`, `mean_word_len` — whitespace words (empty-token
    *     free);
    *   - `symbol_word_ratio` — ('#' count + '...' count) / words;
    *   - `bullet_line_frac` / `ellipsis_line_frac` — fraction of lines
    *     starting with a bullet (-, *, •) / ending with an ellipsis;
    *   - `alpha_word_frac` — fraction of words containing a letter;
    *   - `n_stop_hits` — occurrences of the engine's marker stopwords.
    */
  def gopherSignals(text: Column): Column =
    graft.functions.bound(filter(tokens(text), w => w =!= "")) { ws =>
      graft.functions.bound(split(text, "\n")) { lines =>
        val nWords = size(ws).cast(LongType)
        val nWordsD = nWords.cast(DoubleType)
        val sumLen = aggregate(ws, lit(0L), (a, w) => a + length(w).cast(LongType))
        val nHash = length(text) - length(replace(text, lit("#"), lit("")))
        val nEllipsis =
          (length(text) - length(replace(text, lit("..."), lit("")))) / 3
        val nLines = size(lines).cast(DoubleType)
        val bullet = size(filter(lines, l => l.rlike("^[-*•]")))
        val ell = size(filter(lines, l => l.rlike("\\.\\.\\.$")))
        val alpha = size(filter(ws, w => w.rlike("[a-zA-Z]")))
        val stops = size(filter(ws, w => lower(w).isin(stopwords: _*)))
        struct(
          nWords.as("n_words"),
          when(nWords === 0, 0.0)
            .otherwise(sumLen.cast(DoubleType) / nWordsD).as("mean_word_len"),
          when(nWords === 0, 0.0)
            .otherwise((nHash + nEllipsis).cast(DoubleType) / nWordsD)
            .as("symbol_word_ratio"),
          (bullet.cast(DoubleType) / nLines).as("bullet_line_frac"),
          (ell.cast(DoubleType) / nLines).as("ellipsis_line_frac"),
          when(nWords === 0, 0.0)
            .otherwise(alpha.cast(DoubleType) / nWordsD).as("alpha_word_frac"),
          stops.cast(LongType).as("n_stop_hits"))
      }
    }

  /** C4's line-level cleaning (Raffel et al. 2020 §2.2, the published
    * "Colossal Clean Crawled Corpus" rules) under a DECLARED contract:
    * lines split on `\n` and trimmed; a line is KEPT iff it ends in a
    * terminal punctuation mark (`.` `!` `?` or a closing `"`), has at
    * least `minLineWords` whitespace words, and does not contain the
    * word "javascript" (case-insensitive — the paper's boilerplate
    * tell). Returns the kept lines re-joined with `\n` (empty string
    * when nothing survives). Expression-only, zero shuffles. */
  def c4LineClean(text: Column, minLineWords: Int = 3): Column =
    graft.functions.bound(transform(split(text, "\n"), l => trim(l))) { ls =>
      array_join(filter(ls, l =>
        l.rlike("[.!?\"]$") &&
          size(filter(split(l, "\\s+"), w => w =!= "")) >= minLineWords &&
          !lower(l).contains("javascript")), "\n")
    }

  /** C4's page-level gate over the [[c4LineClean]]ed text: keep iff the
    * cleaned page still has at least `minSentences` sentences (declared:
    * terminal `.` `!` `?` occurrences), does not contain "lorem ipsum"
    * (case-insensitive), does not contain a curly brace `{` (the
    * paper's code tell), and is non-empty. */
  def c4PageKeep(cleaned: Column, minSentences: Int = 5): Column =
    graft.functions.bound(cleaned) { c =>
      (length(c) - length(regexp_replace(c, "[.!?]", ""))) >= minSentences &&
        !lower(c).contains("lorem ipsum") &&
        !c.contains("{") && length(c) > 0
    }

  /** The published Gopher REPETITION signals (Rae et al. 2021 §A1.1 —
    * the other half of the paper's web-corpus gate, next to
    * [[gopherSignals]]): duplicate line / paragraph fractions and
    * character fractions, the top word-n-gram character fraction for
    * n = 2..4, and the duplicated word-n-gram character fraction for
    * n = 5..10. One expression-only struct; every fraction is a single
    * IEEE divide over exact integer counts, so the SQL mirror is
    * bit-identical.
    *
    * Declared contract (the paper describes the signals, not an exact
    * algorithm; this implementation pins one):
    *   - lines split on `\n`, paragraphs on `\n\n`, EMPTY segments
    *     dropped; `dup_*_frac` = (segments − distinct segments) /
    *     segments; `dup_*_char_frac` = characters of every occurrence
    *     beyond a value's first / total segment characters;
    *   - words = whitespace tokens; n-grams are the space-joined
    *     sliding windows (all occurrences, not distinct); the character
    *     denominator is the space-joined word stream's length;
    *   - `top_Ngram_char_frac` = (count × chars) of the most frequent
    *     n-gram (ties: the longer one — maximizes the fraction, and
    *     equal count+length ⇒ equal fraction either way), counted even
    *     at frequency 1, as the published filter implementations do;
    *   - `dup_Ngram_char_frac` sums (count − 1) × chars over duplicated
    *     n-grams — occurrences may overlap in the text, so the ratio is
    *     capped at 1.0 (declared, monotone).
    * Zero-denominator cases are 0.0.
    *
    * Memory shape: the nine n-gram views materialize transiently per
    * row (Σn ≈ 50× the document's bytes) — run AFTER a document-length
    * gate (the [[gopherKeep]] 100k-word cap bounds this at ~60 MB for
    * the most pathological kept doc; ungated multi-GB rows would not be
    * safe here, nor anywhere else in a row-oriented engine). */
  def gopherRepetition(text: Column): Column = {
    def nonEmpty(arr: Column): Column = filter(arr, s => s =!= "")
    def sumLen(arr: Column): Column =
      aggregate(arr, lit(0L), (a, x) => a + length(x).cast(LongType))
    def frac(num: Column, den: Column): Column =
      when(den === 0, 0.0).otherwise(num.cast(DoubleType) / den.cast(DoubleType))
    // characters of every occurrence beyond a value's first: adjacent
    // equal pairs in the sorted array each contribute the value's length
    def extraChars(arr: Column): Column =
      graft.functions.bound(array_sort(arr)) { sorted =>
        when(size(sorted) < 2, lit(0L)).otherwise(
          aggregate(
            zip_with(slice(sorted, lit(1), size(sorted) - 1),
              slice(sorted, lit(2), size(sorted) - 1),
              (a, b) => when(a === b, length(b).cast(LongType)).otherwise(lit(0L))),
            lit(0L), (a, x) => a + x))
      }
    // (count, chars) of the most frequent value via one sorted-run fold
    // (ties to the longer value); returns count * chars
    def topChars(arr: Column): Column =
      graft.functions.bound(array_sort(arr)) { sorted =>
        val folded = aggregate(sorted,
          struct(lit("").as("prev"), lit(0L).as("run"),
            lit(0L).as("bc"), lit(0L).as("bl")),
          (acc, x) => {
            val same = acc("prev") === x && acc("run") > 0
            val closes = !same && (acc("run") > acc("bc") ||
              (acc("run") === acc("bc") &&
                length(acc("prev")).cast(LongType) > acc("bl")))
            struct(x.as("prev"),
              when(same, acc("run") + 1).otherwise(lit(1L)).as("run"),
              when(closes, acc("run")).otherwise(acc("bc")).as("bc"),
              when(closes, length(acc("prev")).cast(LongType))
                .otherwise(acc("bl")).as("bl"))
          })
        graft.functions.bound(folded) { f =>
          val closes = f("run") > f("bc") ||
            (f("run") === f("bc") && length(f("prev")).cast(LongType) > f("bl"))
          when(closes, f("run") * length(f("prev")).cast(LongType))
            .otherwise(f("bc") * f("bl"))
        }
      }
    def ngrams(ws: Column, n: Int): Column =
      when(size(ws) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(ws) - lit(n - 1)),
          i => concat_ws(" ", (0 until n).map(o => element_at(ws, i + lit(o))): _*)))
    def dupSeg(arr: Column, what: String): Seq[Column] =
      Seq(frac(size(arr) - size(array_distinct(arr)), size(arr))
        .as(s"dup_${what}_frac"),
        frac(extraChars(arr), sumLen(arr)).as(s"dup_${what}_char_frac"))
    graft.functions.bound(nonEmpty(tokens(text))) { ws =>
      graft.functions.bound(nonEmpty(split(text, "\n"))) { lines =>
        graft.functions.bound(nonEmpty(split(text, "\n\n"))) { paras =>
          // the space-joined word stream's length — the n-gram denominator
          val streamLen = sumLen(ws) + greatest(size(ws).cast(LongType) - 1, lit(0L))
          val tops = (2 to 4).map(n =>
            frac(topChars(ngrams(ws, n)), streamLen).as(s"top_${n}gram_char_frac"))
          val dups = (5 to 10).map(n =>
            least(frac(extraChars(ngrams(ws, n)), streamLen), lit(1.0))
              .as(s"dup_${n}gram_char_frac"))
          struct(dupSeg(lines, "line") ++ dupSeg(paras, "para") ++
            tops ++ dups: _*)
        }
      }
    }
  }

  /** The Gopher repetition gate over [[gopherRepetition]] with the
    * paper's published thresholds (Table A1): duplicate line/paragraph
    * fraction ≤ 0.30, their character fractions ≤ 0.20, top 2/3/4-gram
    * character fraction ≤ 0.20/0.18/0.16, duplicated 5..10-gram
    * character fraction ≤ 0.15 down to 0.10. */
  def gopherRepetitionKeep(text: Column): Column =
    graft.functions.bound(gopherRepetition(text)) { g =>
      g("dup_line_frac") <= 0.30 && g("dup_para_frac") <= 0.30 &&
        g("dup_line_char_frac") <= 0.20 && g("dup_para_char_frac") <= 0.20 &&
        g("top_2gram_char_frac") <= 0.20 &&
        g("top_3gram_char_frac") <= 0.18 &&
        g("top_4gram_char_frac") <= 0.16 &&
        g("dup_5gram_char_frac") <= 0.15 &&
        g("dup_6gram_char_frac") <= 0.14 &&
        g("dup_7gram_char_frac") <= 0.13 &&
        g("dup_8gram_char_frac") <= 0.12 &&
        g("dup_9gram_char_frac") <= 0.11 &&
        g("dup_10gram_char_frac") <= 0.10
    }

  /** The Gopher keep/drop gate over [[gopherSignals]] with the paper's
    * published thresholds (50 ≤ words ≤ 100 000, mean word length in
    * [3, 10], symbol ratio ≤ 0.1, ≤ 90% bullet lines, ≤ 30% ellipsis
    * lines, ≥ 80% alphabetic words, ≥ 2 stopword hits). */
  def gopherKeep(text: Column): Column =
    graft.functions.bound(gopherSignals(text)) { g =>
      g("n_words") >= 50 && g("n_words") <= 100000 &&
        g("mean_word_len") >= 3.0 && g("mean_word_len") <= 10.0 &&
        g("symbol_word_ratio") <= 0.1 &&
        g("bullet_line_frac") <= 0.9 &&
        g("ellipsis_line_frac") <= 0.3 &&
        g("alpha_word_frac") >= 0.8 &&
        g("n_stop_hits") >= 2
    }

  /** Raw (non-distinct, order-preserving) word n-gram shingles — the
    * counting variant of [[wordShingles]] for repetition signals. */
  def wordShinglesAll(text: Column, n: Int): Column =
    graft.functions.bound(tokens(text)) { ws =>
      val joined = transform(
        sequence(lit(1), size(ws) - lit(n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(ws, i + lit(o))): _*))
      when(size(ws) < n, array().cast("array<string>")).otherwise(joined)
    }

  /** Longest run of equal values in a SORTED long array == the count of
    * the most frequent value. Pure expression fold (no shuffle, no
    * explode): the accumulator carries (prev, run, best). */
  def maxRunLength(sorted: Column): Column =
    graft.functions.bound(sorted) { s =>
      aggregate(s,
        struct(lit(0L).as("prev"), lit(0L).as("run"), lit(0L).as("best")),
        (acc, x) => graft.functions.bound(
          when(acc.getField("run") === 0, 1L)
            .when(acc.getField("prev") === x, acc.getField("run") + 1L)
            .otherwise(1L)) { run =>
          struct(x.as("prev"), run.as("run"),
            greatest(acc.getField("best"), run).as("best"))
        }).getField("best")
    }

  /** Occurrences of the document's most frequent word n-gram — the
    * Gopher-style repetition signal (Rae et al. 2021 §A1.1 use the
    * character fraction of the top n-gram; this is the count numerator,
    * turned into a token-occupancy fraction by the caller). Expression-
    * only: hash the raw shingles, sort, take the longest equal-run. */
  def topNgramCount(text: Column, n: Int): Column =
    maxRunLength(array_sort(call_function("graft_md5_hash_array",
      wordShinglesAll(text, n), lit(15))))

  /** Token-window chunking — the pretraining/RAG chunker: split the
    * token stream into windows of `size` tokens advancing by
    * `size - overlap`, space-rejoined. Expression-only (explode to rows
    * at the call site); a document shorter than `size` yields one chunk.
    * Starts are 1, 1+stride, ... up to max(len-overlap, 1), so every
    * token belongs to >= 1 chunk and no empty tail chunk is emitted. */
  def chunkTokens(text: Column, size: Int, overlap: Int): Column = {
    require(size > overlap && overlap >= 0,
      s"need size > overlap >= 0, got size=$size overlap=$overlap")
    val stride = size - overlap
    graft.functions.bound(tokens(text)) { ws =>
      transform(
        sequence(lit(1), greatest(org.apache.spark.sql.functions.size(ws) - lit(overlap), lit(1)), lit(stride)),
        s => concat_ws(" ", slice(ws, s, lit(size))))
    }
  }

  /** Marker (stopword) lists for the LATIN-script language argmax.
    * Deterministic and tiny by design: real deployments swap in a
    * fastText-style model behind the same column signature. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is"),
    "de" -> Seq("der", "und", "die", "ist"),
    "es" -> Seq("el", "los", "de", "es"),
    "fr" -> Seq("le", "les", "des", "est"))

  /** Marker lists for the CYRILLIC-script argmax (same shape). */
  val cyrillicMarkers: Map[String, Seq[String]] = Map(
    "ru" -> Seq("и", "не", "на", "что"),
    "uk" -> Seq("і", "що", "на", "це"))

  /** Count of tokens matching a marker list. */
  def markerHits(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(markers: _*))).cast(LongType)

  private def markerHitsOf(ws: Column, markers: Seq[String]): Column =
    size(filter(ws, t => t.isin(markers: _*))).cast(LongType)

  /** Argmax over a marker table; ties break by language code ascending
    * (deterministic); zero hits => the script-derived fallback label.
    * Argmax via array_max over (hits, -rank, lang) structs: ties on hits
    * resolve to the smallest rank = earliest language in sorted order,
    * identical to a first-wins fold. O(1) expression depth — the fold
    * form re-referenced both subtrees per level and tripled the codegen
    * size per language (round-1 verdict perf note). */
  private def markerArgmax(ws: Column, table: Map[String, Seq[String]],
                           fallback: String): Column = {
    val scored = table.toSeq.sortBy(_._1).zipWithIndex.map {
      case ((lang, ms), i) =>
        struct(markerHitsOf(ws, ms).as("hits"), lit(-i).as("negrank"),
          lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("hits") === 0, fallback)
      .otherwise(best.getField("lang"))
  }

  /** One-pass Unicode-script census — ARRAY<BIGINT> in the
    * [[graft.expressions.ScriptCounts]] layout (total non-whitespace,
    * the nine routed scripts, ASCII digits, kana). ONE native
    * expression pass per row, replacing the per-class
    * `regexp_replace`-strip sweep the router used to pay (the round-8
    * q19 regression); the strip-arithmetic formulation remains the SQL
    * mirror's definition and matches count-for-count. */
  def scriptCounts(text: Column): Column =
    call_function("graft_script_counts", text)

  /** Element of a [[scriptCounts]] array by 0-based layout index. */
  private def sc(c: Column, idx: Int): Column = element_at(c, idx + 1)

  /** The routed scripts in dominance TIE ORDER (pinned by
    * CurationOpsSpec): the original big-four first — their relative
    * order is round-1-stable — then the round-9 additions in crawl
    * volume order. Each entry: (label, counts index). The label
    * capitalized is the script's regex class name on BOTH engines
    * (Java `\p{IsLatin}` / RE2 `\p{Latin}`), which is what keeps the
    * SQL mirror generatable from this ONE list. */
  private[graft] val scriptOrder: Seq[(String, Int)] = {
    import graft.expressions.ScriptCounts._
    Seq("latin" -> Latin, "cyrillic" -> Cyrillic, "han" -> Han,
      "arabic" -> Arabic, "hangul" -> Hangul, "devanagari" -> Devanagari,
      "thai" -> Thai, "greek" -> Greek, "hebrew" -> Hebrew)
  }

  /** Language guess, ROUTED BY SCRIPT first ([[scriptProfile]] — marker
    * words are script-specific, so running a Latin stopword argmax on
    * Han text can only ever say "und"): Latin-dominant text goes to the
    * [[langMarkers]] argmax, Cyrillic-dominant to [[cyrillicMarkers]],
    * Han-dominant is "ja" when kana is present else "zh", and the
    * single-language scripts label directly — Arabic "ar", Hangul "ko",
    * Devanagari "hi", Thai "th", Greek "el", Hebrew "he". Zero marker
    * hits inside an argmax'd script return the BCP-47-style
    * script-qualified undetermined tag ("und-Latn" / "und-Cyrl") —
    * downstream filters drop on prefix "und". Unrouted scripts and
    * whitespace-only text stay "und". ONE census pass + marker lookups,
    * scan-level, no shuffle. */
  def langId(text: Column): Column = graft.functions.bound(tokens(text)) { ws =>
    graft.functions.bound(scriptCounts(text)) { c =>
      graft.functions.bound(dominanceOf(c)) { script =>
        when(script === "latin", markerArgmax(ws, langMarkers, "und-Latn"))
          .when(script === "cyrillic",
            markerArgmax(ws, cyrillicMarkers, "und-Cyrl"))
          .when(script === "han",
            when(sc(c, graft.expressions.ScriptCounts.Kana) > 0, "ja")
              .otherwise("zh"))
          .when(script === "arabic", "ar")
          .when(script === "hangul", "ko")
          .when(script === "devanagari", "hi")
          .when(script === "thai", "th")
          .when(script === "greek", "el")
          .when(script === "hebrew", "he")
          .otherwise("und")
      }
    }
  }

  /** Marker argmax with the label's NORMALIZED MARGIN beside it:
    * (best - second) / (best + second) over the per-language marker hit
    * counts — exact integer subtraction/addition feeding ONE IEEE
    * division, so the double is bit-stable across engines and
    * partitionings. 1.0 when only one language's markers hit; 0.0 on a
    * dead tie between the top two; 0.0 with the fallback label when no
    * markers hit at all. */
  private def markerArgmaxScored(ws: Column, table: Map[String, Seq[String]],
                                 fallback: String): Column = {
    val scored = table.toSeq.sortBy(_._1).zipWithIndex.map {
      case ((lang, ms), i) =>
        struct(markerHitsOf(ws, ms).as("hits"), lit(-i).as("negrank"),
          lit(lang).as("lang"))
    }
    graft.functions.bound(array(scored: _*)) { arr =>
      val best = array_max(arr)
      val hitsDesc = sort_array(transform(arr, s => s.getField("hits")),
        asc = false)
      val h1 = element_at(hitsDesc, 1)
      val h2 = element_at(hitsDesc, 2)
      struct(
        when(best.getField("hits") === 0, fallback)
          .otherwise(best.getField("lang")).as("lang"),
        when(best.getField("hits") === 0, lit(0.0))
          .otherwise((h1 - h2).cast(DoubleType) / (h1 + h2)).as("score"))
    }
  }

  /** [[langId]] with a CONFIDENCE score beside the label — what
    * curation pipelines threshold on (CCNet keeps fastText p >= 0.5)
    * instead of trusting a bare label. Same ONE census pass + marker
    * lookups as [[langId]]; pure expressions, scan-level, no shuffle,
    * and every score is exact-integer arithmetic feeding a single IEEE
    * division, so the doubles are bit-stable across engines. Score
    * semantics: for the marker-argmax'd scripts (Latin / Cyrillic) the
    * normalized margin (best - second) / (best + second) over marker
    * hits — 0.0 on a dead top-two tie or when no marker hit (und-*);
    * for the script-routed single-label scripts the script ratio
    * (routed script chars / total non-whitespace chars — Han text
    * scores its Han density whether labeled zh or ja); 0.0 for
    * und/none/other. Returns struct(lang STRING, score DOUBLE); the
    * labels are IDENTICAL to [[langId]]'s (CurationOpsSpec pins it). */
  def langIdScored(text: Column): Column = graft.functions.bound(tokens(text)) { ws =>
    graft.functions.bound(scriptCounts(text)) { c =>
      graft.functions.bound(dominanceOf(c)) { script =>
        import graft.expressions.ScriptCounts._
        def ratio(label: String, idx: Int) =
          struct(lit(label).as("lang"),
            (sc(c, idx).cast(DoubleType) / sc(c, Total)).as("score"))
        when(script === "latin", markerArgmaxScored(ws, langMarkers, "und-Latn"))
          .when(script === "cyrillic",
            markerArgmaxScored(ws, cyrillicMarkers, "und-Cyrl"))
          .when(script === "han",
            struct(when(sc(c, Kana) > 0, "ja").otherwise("zh").as("lang"),
              (sc(c, Han).cast(DoubleType) / sc(c, Total)).as("score")))
          .when(script === "arabic", ratio("ar", Arabic))
          .when(script === "hangul", ratio("ko", Hangul))
          .when(script === "devanagari", ratio("hi", Devanagari))
          .when(script === "thai", ratio("th", Thai))
          .when(script === "greek", ratio("el", Greek))
          .when(script === "hebrew", ratio("he", Hebrew))
          .otherwise(struct(lit("und").as("lang"), lit(0.0).as("score")))
      }
    }
  }

  /** The dominance label from a [[scriptCounts]] census — the ONE
    * definition [[scriptProfile]] and the langId router share, so the
    * tie order (pinned by CurationOpsSpec) can never live in two
    * places: earlier [[scriptOrder]] entries win ties, a script must
    * have > 0 chars to claim dominance, "none" for whitespace-only
    * text, "other" when no routed script appears. */
  private def dominanceOf(c: Column): Column = {
    import graft.expressions.ScriptCounts.Total
    val chain = scriptOrder.zipWithIndex.foldLeft(
      when(sc(c, Total) === 0, "none")) {
      case (acc, ((label, idx), i)) =>
        val later = scriptOrder.drop(i + 1).map(_._2)
        val cond = later.foldLeft(sc(c, idx) > 0) { (e, l) =>
          e && sc(c, idx) >= sc(c, l)
        }
        acc.when(cond, label)
    }
    chain.otherwise("other")
  }

  // ---- PII scrubbing (training-data redaction) ----
  // Patterns restricted to the RE2-compatible subset (no backrefs, no
  // lookaround) so the same literal strings run in any engine an oracle
  // or downstream consumer might use. ASCII word boundaries only.
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Occurrence count of one PII pattern (codegen'd regexp, no UDF). */
  /** fastText-style hashed-feature linear document scorer: each token is
    * hashed into one of `dim` weight buckets ([[hash32]] mod dim) and the
    * score is the mean of the buckets' weights — the shape of the linear
    * quality classifiers (fastText, DCLM-fasttext, FineWeb-Edu distills)
    * used as cheap corpus-wide quality gates. The weight table is not
    * stored anywhere: bucket b's weight is a deterministic pseudo-weight
    * in [-1, 1] derived from md5(seed|b) — swap [[pseudoWeight]] for a
    * trained table (broadcast literal array, same plan) without touching
    * the pipeline. Pure expression chain (one md5 per token, integer
    * accumulation — exact in any engine; a single float division at the
    * end), codegen'd at the scan: scoring 100 TB costs one pass, no
    * shuffle, no UDF. Empty/blank docs score 0. */
  def hashClassifierScore(text: Column, dim: Int = 1024,
                          seed: String = "qlr"): Column =
    graft.functions.bound(tokens(text)) { ws =>
      val sum = aggregate(
        transform(ws, t => pseudoWeight(hash32(t) % dim, seed)),
        lit(0L), (acc, x) => acc + x)
      // blank docs: split(trim('')) is [''] (size 1), not [], in Spark
      // AND DuckDB — guard on the text, not the token count
      when(length(trim(text)) === 0, lit(0.0))
        .otherwise(sum.cast(DoubleType) /
          (lit(1000.0) * size(ws).cast(DoubleType)))
    }

  /** Integer pseudo-weight in [-1000, 1000] for a hashed feature bucket:
    * md5(seed|bucket) mod 2001 - 1000. Kept integral so per-doc sums are
    * order-independent and exact (floats enter only in the final mean). */
  def pseudoWeight(bucket: Column, seed: String): Column =
    hash60(concat(lit(seed + "|"), bucket.cast(org.apache.spark.sql.types.StringType))) % 2001L - 1000L

  /** TRAINED weights for the hashed linear quality classifier — the
    * fastText-shape trainer the [[hashClassifierScore]] scaladoc
    * promised a swap-in for. Full-batch gradient descent on squared
    * loss over hashed term frequencies:
    *
    *   score(d) = Σ_j w_j · x_dj,  x_dj = cnt_dj / len_d,
    *   bucket j = hash32(token) % dim (the q76 bucket contract),
    *   w ← w − (1/lrDiv) · (1/n) Σ_d (score(d) − y_d) · x_d
    *
    * computed ENTIRELY in integer micro-units so the run is
    * order-independent and engine-exact (the kmeansTrain discipline):
    * weights live as w6 = round(w·1e6) longs, per-doc predictions as
    * pred12 = (Σ_j w6_j·cnt_dj · 1e6) div len_d, per-doc gradient
    * terms as (r12·cnt) div len — `div` truncates toward zero in BOTH
    * Spark and DuckDB, so every quantization step mirrors bit-for-bit
    * (q93 unrolls both iterations in SQL). The learning rate is the
    * exact rational 1/lrDiv for the same reason.
    *
    * Scale: per iteration one (doc-keyed) prediction aggregate over the
    * hashed-feature rows and one (bucket-keyed) gradient aggregate —
    * two exchanges over n × (distinct buckets per doc) rows; the driver
    * holds only the dim-sized w6 table (broadcast into the next
    * iteration as an array literal, element_at codegen'd — no join).
    * Features are hashed ONCE and persisted across iterations. */
  def trainHashClassifier(df: DataFrame, idCol: String, textCol: String,
                          labelCol: String, dim: Int = 64,
                          iters: Int = 2, lrDiv: Long = 2L): Array[Long] = {
    require(dim >= 1 && iters >= 0 && lrDiv >= 1)
    val n = df.count()
    require(n > 0, "empty training frame")
    val feats = df
      .select(col(idCol).cast(LongType).as("__did"),
        col(labelCol).cast(LongType).as("y"),
        tokens(col(textCol)).as("ws"))
      .select(col("__did"), col("y"), size(col("ws")).cast(LongType).as("len"),
        explode(col("ws")).as("tok"))
      .groupBy(col("__did"), col("y"), col("len"),
        (hash32(col("tok")) % dim).as("j"))
      .agg(count(lit(1)).as("cnt"))
      .persist()
    val w6 = Array.fill(dim)(0L)
    try {
      for (_ <- 0 until iters) {
        val wLit = typedlit(w6.toSeq)
        val resid = feats
          .withColumn("t", element_at(wLit, (col("j") + 1).cast("int")) * col("cnt"))
          .groupBy("__did", "y", "len")
          .agg(sum("t").as("s"))
          .select(col("__did"),
            (expr("(s * 1000000) div len") - col("y") * lit(1000000000000L))
              .as("r12"))
        // dim-sized collect: the gradient IS the model-sized table.
        // Per-doc terms are ~1e12 magnitude, so a Long sum would wrap
        // silently past ~10^6 docs (non-ANSI); accumulate in
        // DECIMAL(38,0) instead — exact at any corpus size, and the
        // final truncating division matches Long `/` (toward zero).
        val grads = feats.join(resid, Seq("__did"))
          .select(col("j"),
            expr("CAST((r12 * cnt) div len AS DECIMAL(38,0))").as("gq"))
          .groupBy("j").agg(sum("gq").as("sq"))
          .collect()
        val lrDen = java.math.BigInteger.valueOf(lrDiv * n * 1000000L)
        for (r <- grads)
          w6(r.getLong(0).toInt) -= r.getDecimal(1).toBigInteger
            .divide(lrDen).longValueExact()
      }
    } finally feats.unpersist()
    w6
  }

  /** Query-shaped view of [[trainHashClassifier]]: one row per bucket
    * with the exact micro-weight and its real value. Local relation —
    * the model lives on the driver, dim rows. */
  def trainedClassifierFrame(df: DataFrame, idCol: String, textCol: String,
                             labelCol: String, dim: Int = 64,
                             iters: Int = 2, lrDiv: Long = 2L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    trainHashClassifier(df, idCol, textCol, labelCol, dim, iters, lrDiv)
      .toSeq.zipWithIndex
      .map { case (w, j) => (j.toLong, w, w.toDouble / 1e6) }
      .toDF("bucket", "w6", "weight")
  }

  /** Score with TRAINED micro-weights: Σ_tok w6[bucket(tok)] summed as
    * exact longs (order-independent), one IEEE division at the end —
    * the [[hashClassifierScore]] shape with the pseudo-weight lookup
    * replaced by the trained table (array literal, element_at
    * codegen'd at the scan; no join, no shuffle, no UDF). */
  def hashClassifierScoreWith(text: Column, w6: Seq[Long], dim: Int): Column =
    graft.functions.bound(tokens(text)) { ws =>
      val sum = aggregate(
        transform(ws, t =>
          element_at(typedlit(w6), ((hash32(t) % dim) + 1).cast("int"))),
        lit(0L), (acc, x) => acc + x)
      when(length(trim(text)) === 0, lit(0.0))
        .otherwise(sum.cast(DoubleType) /
          (lit(1e6) * size(ws).cast(DoubleType)))
    }

  /** CCNet-style statistical LM quality score: an add-k-smoothed BIGRAM
    * language model trained on the reference subset (`modelFilter` rows —
    * CCNet trains its KenLM on Wikipedia; here the caller picks the
    * trusted slice) and scored over EVERY document as the average bigram
    * log-probability (plus derived perplexity). Out-of-model bigrams get
    * the smoothed floor, so low scores flag text unlike the reference —
    * the classic "perplexity filter" of LLM data pipelines, re-expressed
    * without an external LM artifact.
    *
    * P(w2|w1) = (c(w1,w2) + k) / (c(w1,·) + k·V), V = reference vocab.
    *
    * Scale shape: the model tables (c12/c1) are REFERENCE-bounded, not
    * corpus-bounded — for a CCNet-style trusted slice they broadcast, and
    * the scoring pass is then map-side against the corpus's exploded
    * bigrams with one keyed per-doc aggregate. V rides the SAME plan as
    * a broadcast one-row aggregate (cross join against the scoring
    * side): building this DataFrame runs no job, the model snapshot is
    * taken when the query executes (never stale vs the other model
    * tables), and the operator composes lazily/streamed like every
    * other one here. Per-bigram log-probs average to round(6): the
    * identical ln/avg contract the geomean aggregate (q03) has
    * hash-matched against the oracle since round 1. */
  def bigramLmScore(df: DataFrame, idCol: String, textCol: String,
                    modelFilter: Column, addK: Double = 0.5): DataFrame = {
    val tok = df.select(col(idCol).cast(LongType).as("doc_id"),
      modelFilter.as("__in_model"), split(col(textCol), " ").as("t"))
    val bi = tok.filter(size(col("t")) >= 2)
      .select(col("doc_id"), col("__in_model"), explode(transform(
        sequence(lit(0), size(col("t")) - 2),
        i => struct(element_at(col("t"), i + 1).as("w1"),
          element_at(col("t"), i + 2).as("w2")))).as("b"))
      .select(col("doc_id"), col("__in_model"), col("b.w1"), col("b.w2"))
    val c12 = bi.filter(col("__in_model"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy("w1").agg(sum("c12").as("c1"))
    // V as a broadcast 1-row aggregate instead of an eager head(): no
    // job runs at plan-construction time, and the vocab snapshot is
    // taken atomically with the c12/c1 model tables at execution
    val vocab = tok.filter(col("__in_model"))
      .select(explode(col("t")).as("tok"))
      .agg(count_distinct(col("tok")).as("__V"))
    val scored = bi
      .join(c12, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log((coalesce(col("c12"), lit(0L)) + lit(addK)) /
          (coalesce(col("c1"), lit(0L)) + lit(addK) * col("__V")))), 6)
          .as("avg_logp"))
    df.select(col(idCol).cast(LongType).as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("avg_logp"),
        round(exp(-col("avg_logp")), 4).as("ppl"))
  }

  /** Interpolated Kneser–Ney bigram LM score — the smoothing family the
    * published perplexity filters actually use (CCNet scores with KenLM,
    * whose models are Kneser–Ney; Kneser & Ney 1995, the interpolated
    * form of Chen & Goodman 1999):
    *
    *   P(w2|w1) = max(c(w1,w2)−D, 0)/c(w1)
    *              + D·N1+(w1,·)/c(w1) · Pcont(w2)
    *   Pcont(w2) = (N1+(·,w2) + k) / (T + k·(V+1))
    *
    * with discount `D`, continuation counts N1+ (DISTINCT continuations
    * / left contexts — the insight that "Francisco" is frequent but
    * follows only "San"), T = distinct bigram types, and add-k mass at
    * the lowest order over V+1 outcomes so an unseen word keeps a
    * nonzero floor (the q82 `addK` convention). An out-of-vocab
    * context (c(w1)=0) backs off fully to Pcont. Model = `modelFilter`
    * slice; every document scored (the CCNet shape), output matching
    * [[bigramLmScore]]: (doc_id, n_bigrams, avg_logp, ppl).
    *
    * Cross-engine contract: every per-bigram probability is a small
    * tree of +,*,/ over exact integer counts — correctly-rounded IEEE
    * ops, bit-identical in any engine — and only avg(ln p) takes the
    * 6-dp wash. Scale shape = [[bigramLmScore]]'s: model tables are
    * vocab-bounded aggregates joined onto the bigram stream, scalars
    * ride one lazy broadcast row, the doc aggregate is the only
    * data-sized exchange. */
  def knBigramScore(df: DataFrame, idCol: String, textCol: String,
                    modelFilter: Column, discount: Double = 0.75,
                    addK: Double = 0.5): DataFrame = {
    val tok = df.select(col(idCol).cast(LongType).as("doc_id"),
      modelFilter.as("__in_model"), split(col(textCol), " ").as("t"))
    val bi = tok.filter(size(col("t")) >= 2)
      .select(col("doc_id"), col("__in_model"), explode(transform(
        sequence(lit(0), size(col("t")) - 2),
        i => struct(element_at(col("t"), i + 1).as("w1"),
          element_at(col("t"), i + 2).as("w2")))).as("b"))
      .select(col("doc_id"), col("__in_model"), col("b.w1"), col("b.w2"))
    val c12 = bi.filter(col("__in_model"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    // per-context: total count + DISTINCT continuations (c12 rows are
    // distinct (w1,w2) pairs, so count(*) IS the continuation count)
    val c1 = c12.groupBy("w1")
      .agg(sum("c12").as("c1"), count(lit(1)).as("n1p"))
    val n1l = c12.groupBy("w2").agg(count(lit(1)).as("n1l"))
    val scalars = c12.agg(count(lit(1)).as("T")).crossJoin(broadcast(
      tok.filter(col("__in_model")).select(explode(col("t")).as("tok"))
        .agg(count_distinct(col("tok")).as("V"))))
    val pc = (coalesce(col("n1l"), lit(0L)) + lit(addK)) /
      (col("T") + lit(addK) * (col("V") + lit(1L)))
    val p = when(col("c1").isNull, pc)
      .otherwise(
        greatest(coalesce(col("c12"), lit(0L)) - lit(discount), lit(0d)) /
          col("c1") +
          lit(discount) * col("n1p") / col("c1") * pc)
    val scored = bi
      .join(c12, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .join(n1l, Seq("w2"), "left")
      .crossJoin(broadcast(scalars))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log(p)), 6).as("avg_logp"))
    df.select(col(idCol).cast(LongType).as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("avg_logp"),
        round(exp(-col("avg_logp")), 4).as("ppl"))
  }

  /** CCNet perplexity buckets — the published head/middle/tail split
    * (Wenzek et al. 2020 §4.3): per LANGUAGE, rank documents by LM
    * perplexity against the trusted reference and cut at the terciles;
    * `head` (lowest ppl) is what pretraining mixes upweight. Scored
    * with [[knBigramScore]] (CCNet uses KenLM = Kneser–Ney); docs with
    * no bigrams label `unscored` and never influence the cuts.
    *
    * Cuts are the exact interpolated terciles over the 4-dp-rounded
    * ppl (the q73 percentile ≡ quantile_cont contract, so thresholds
    * and labels are engine-portable). Scale note: exact per-group
    * percentiles buffer a language's values — at corpus scale swap the
    * cut computation for [[Profiling.binnedQuantilesByGroup]], whose
    * error is bounded by one bin; the label join is unchanged. The
    * threshold table is language-bounded and broadcast. */
  def ccnetBuckets(df: DataFrame, idCol: String, textCol: String,
                   langCol: String, modelFilter: Column): DataFrame = {
    val scored = knBigramScore(df, idCol, textCol, modelFilter)
      .select(col("doc_id"), col("ppl"))
    val withLang = df.select(col(idCol).cast(LongType).as("doc_id"),
        col(langCol).as("lang"))
      .join(scored, Seq("doc_id"))
    val th = withLang.filter(col("ppl").isNotNull)
      .groupBy("lang")
      .agg(expr("percentile(ppl, 1d/3)").as("t1"),
        expr("percentile(ppl, 2d/3)").as("t2"))
    withLang.join(broadcast(th), Seq("lang"), "left")
      .select(col("doc_id"), col("lang"), col("ppl"),
        when(col("ppl").isNull, lit("unscored"))
          .when(col("ppl") <= col("t1"), lit("head"))
          .when(col("ppl") <= col("t2"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast(LongType)

  /** Redact emails, then phone numbers, then IPv4s (fixed order — the
    * stages see each other's output, so order is part of the
    * contract). Pure expression chain: stays inside whole-stage
    * codegen at the scan, the shape a 100 TB scrub pass needs. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, lit(EmailRe), lit("<EMAIL>")),
        lit(PhoneRe), lit("<PHONE>")),
      lit(Ipv4Re), lit("<IP>"))

  // ---- URL / domain curation (RefinedWeb/C4-style blocklist gate) ------

  /** Lowercased host of a URL (scheme://host[:port]/...), null when the
    * value has no scheme+authority shape. Pure regexp — mirrors DuckDB
    * `regexp_extract(url, pattern, 1)` byte for byte. */
  def urlHost(url: Column): Column = {
    val h = lower(regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1))
    when(h === "", lit(null).cast("string")).otherwise(h)
  }

  /** Unicode-script profile — the router in front of any multilingual
    * pipeline (tokenizers, quality models and stopword lists are all
    * script-specific; [[langId]]'s marker words only work inside
    * Latin script). One struct column, expression-only: per-script
    * character ratios over the non-whitespace text (Latin, Cyrillic,
    * Han, Arabic, Hangul, Devanagari, Thai, Greek, Hebrew — the
    * highest-volume crawl scripts — plus ASCII digits) and a `script`
    * label = the argmax with a fixed preference order on ties ("none"
    * for whitespace-only text). Counts come from ONE [[scriptCounts]]
    * census pass (the SQL mirror keeps the equivalent
    * length-after-strip arithmetic — same Unicode Script property,
    * count-identical); ratios are single IEEE divides over exact
    * integer counts. */
  def scriptProfile(text: Column): Column =
    graft.functions.bound(scriptCounts(text)) { c =>
      import graft.expressions.ScriptCounts.{Digits, Total}
      val total = sc(c, Total)
      def ratio(idx: Int): Column =
        when(total === 0, 0.0)
          .otherwise(sc(c, idx).cast(DoubleType) / total.cast(DoubleType))
      val scriptRatios = scriptOrder.map { case (label, idx) =>
        ratio(idx).as(s"${label}_ratio")
      }
      struct((total.as("n_chars") +: scriptRatios) ++ Seq(
        ratio(Digits).as("digit_ratio"),
        dominanceOf(c).as("script")): _*)
    }

  /** Canonical URL normalization — the key a crawl dedups on ("the same
    * page fetched five ways is one document"). A DECLARED, deterministic
    * contract applied in order:
    *
    *   1. strip the fragment (`#...` never reaches the server);
    *   2. lowercase scheme + authority (case-insensitive per RFC 3986),
    *      path/query case PRESERVED;
    *   3. drop explicit default ports (`http://h:80`, `https://h:443`;
    *      any other port survives);
    *   4. drop `utm_*` tracking parameters (head, middle or tail of the
    *      query; a query left empty loses its `?`);
    *   5. strip trailing slashes (root included — canonical form never
    *      ends in `/`).
    *
    * Pure regexp-expression chain at the scan (every pattern inside the
    * RE2 ∩ Java-regex subset — no lookaround, no backrefs — so the SQL
    * mirror is byte-identical). Non-URL strings pass through steps 1/4/5
    * best-effort and are otherwise unchanged; gate with [[urlHost]]
    * null-ness when strictness matters. */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val auth = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?]*", 0)
    val lowered = concat(lower(auth),
      noFrag.substr(length(auth) + 1, length(noFrag)))
    val p80 = regexp_replace(lowered, "^(http://[^/:?]+):80([/?].*)?$", "$1$2")
    val p443 = regexp_replace(p80, "^(https://[^/:?]+):443([/?].*)?$", "$1$2")
    // interior utm params: a global pass consumes the '&' that would
    // prefix an adjacent utm param, so runs of them need one pass each —
    // 3 passes remove runs of up to 3 interior utm params (longer runs
    // leave a residue, IDENTICALLY on both engines: the mirror applies
    // the same fixed pass count, so equality holds regardless)
    val u1 = regexp_replace(p443, "([?&])utm_[^&]*&", "$1")
    val u2 = regexp_replace(u1, "([?&])utm_[^&]*&", "$1")
    val u2b = regexp_replace(u2, "([?&])utm_[^&]*&", "$1")
    val u3 = regexp_replace(u2b, "[?&]utm_[^&]*$", "")
    val noQ = regexp_replace(u3, "\\?$", "")
    regexp_replace(noQ, "/+$", "")
  }

  /** Path-plus-query of a URL (`scheme://auth/path?q` -> `/path?q`,
    * fragment dropped) — the string RFC 9309 rules match against. Empty
    * (authority-only URL) canonicalizes to `/`. Pure regexp; gate with
    * [[urlHost]] null-ness for non-URL strings. */
  def urlPathQuery(url: Column): Column = {
    val p = regexp_extract(url,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)", 1)
    when(p === "", lit("/")).otherwise(p)
  }

  /** SURT key (Sort-friendly URI Reordering Transform — the Internet
    * Archive / Common Crawl CDX index convention): host labels reversed
    * and comma-joined, `www.` dropped (the CC canonicalizer's rule),
    * scheme dropped, then `)` + path-and-query —
    * `https://www.news.example.com/a?q=1` → `com,example,news)/a?q=1`.
    * SURT keys sort all of a registrable domain's URLs contiguously,
    * which is what makes a petabyte CDX index range-scannable by domain;
    * feed [[canonicalUrl]] output for fetch-variant collapse first.
    * Pure built-in expression chain (split/reverse/join), codegen'd at
    * the scan; non-URLs (null [[urlHost]]) yield null. */
  def surtKey(url: Column): Column = {
    val host = regexp_replace(urlHost(url), "^www\\.", "")
    when(host.isNull, lit(null).cast("string"))
      .otherwise(concat(
        array_join(reverse(split(host, "\\.")), ","),
        lit(")"),
        urlPathQuery(url)))
  }

  /** Unicode NFC normalization ([[graft.expressions.NfcNormalize]]) —
    * run before shingling/hashing so NFD and NFC spellings of the same
    * text dedup together. */
  def nfcNormalize(text: Column): Column =
    call_function("graft_nfc", text)

  /** Mojibake repair ([[graft.expressions.FixMojibake]]): UTF-8 that
    * was mis-decoded as Windows-1252 upstream ("cafÃ©") is inverted
    * back to the intended text ("café"); non-mojibake passes through
    * untouched. The ftfy move, as a codegen'd scan expression. */
  def fixMojibake(text: Column): Column =
    call_function("graft_fix_mojibake", text)

  /** RFC 9309 robots.txt decision ([[graft.expressions.RobotsCodec]]):
    * TRUE when `userAgent` may fetch `path` under `robotsTxt`; NULL
    * robots -> NULL (coalesce at the join — missing robots.txt is an
    * EXPLICIT allow, never a silent one). */
  def robotsAllowed(robotsTxt: Column, userAgent: String, path: Column): Column =
    call_function("graft_robots_allowed", robotsTxt, lit(userAgent), path)

  /** The Crawl-delay seconds robots.txt declares for `userAgent`
    * (extension field, group-scoped — named groups win over `*`), as
    * DOUBLE; NULL when undeclared/unparseable — coalesce to the
    * crawler's default delay EXPLICITLY ([[graft.expressions.RobotsCrawlDelay]]). */
  def robotsCrawlDelay(robotsTxt: Column, userAgent: String): Column =
    call_function("graft_robots_crawl_delay", robotsTxt, lit(userAgent))

  /** The file-global Sitemap URLs robots.txt declares, in file order
    * (ARRAY<STRING>, empty when none — [[graft.expressions.RobotsSitemaps]]). */
  def robotsSitemaps(robotsTxt: Column): Column =
    call_function("graft_robots_sitemaps", robotsTxt)

  /** Every dot-suffix of a host, most-specific first:
    * `a.b.example.com` -> `[a.b.example.com, b.example.com, example.com,
    * com]`. Fan-out is bounded by the label count (browsers cap ~127 but
    * real hosts have < 10), which is what makes suffix-matched blocklists
    * joinable at corpus scale: the corpus side grows by a small constant,
    * never by |blocklist|. */
  def hostSuffixes(host: Column): Column =
    graft.functions.bound(split(host, "\\.")) { labels =>
      transform(sequence(lit(1), size(labels)),
        i => array_join(slice(labels, i, size(labels)), "."))
    }

  /** Domain-blocklist gate with registrable-suffix semantics (blocking
    * `example.com` blocks `a.b.example.com` but NOT `notexample.com` or
    * `example.com.evil.net` — list-membership of dot-suffixes, not
    * substring match). The blocklist is inlined as an array literal, so
    * the whole gate is ONE scan-level codegen'd predicate: zero joins,
    * zero shuffles, pushes down with the scan like every other filter in
    * this object. Right shape for the usual curation regime (a bounded
    * curated list: UT1-style categories, spam domains). For million-entry
    * blocklists inlining stops scaling — use [[domainBlocklistFilterWith]],
    * which turns the same suffix semantics into a broadcast join. Rows
    * with un-parseable URLs (null host) are KEPT: the blocklist expresses
    * "known bad", not "known good". */
  def domainBlocklistFilter(df: DataFrame, urlCol: String,
                            blocked: Seq[String]): DataFrame = {
    require(blocked.nonEmpty, "empty blocklist: nothing to filter")
    require(blocked.size <= 4096,
      s"${blocked.size} entries won't inline sanely — use domainBlocklistFilterWith")
    val bad = array(blocked.map(d => lit(d.toLowerCase)): _*)
    df.filter(!coalesce(
      arrays_overlap(hostSuffixes(urlHost(col(urlCol))), bad), lit(false)))
  }

  /** [[domainBlocklistFilter]] against a DataFrame blocklist (one
    * `domain` column) too large to inline: explode each row's bounded
    * host-suffix set, BROADCAST-semi-join it against the blocklist to
    * find blocked row ids, and broadcast-anti-join those ids back. The
    * corpus is never shuffled on either join; the id join-back broadcast
    * is bounded by the blocked-row count — fine in the curation regime
    * (blocklists remove a few percent), and when a poisoned corpus
    * breaks that assumption the caller can pre-partition by `idCol` and
    * swap the hint for a co-located join without touching semantics. */
  def domainBlocklistFilterWith(df: DataFrame, idCol: String, urlCol: String,
                                blockedDomains: DataFrame): DataFrame = {
    val dom = lower(col(blockedDomains.columns.head)).as("__dom")
    val blockedIds = df
      .select(col(idCol), explode(hostSuffixes(urlHost(col(urlCol)))).as("__sfx"))
      .join(broadcast(blockedDomains.select(dom)), col("__sfx") === col("__dom"),
        "left_semi")
      .select(col(idCol)).distinct()
    df.join(broadcast(blockedIds), Seq(idCol), "left_anti")
  }

  /** Per-document top-k terms by TF-IDF — the keyword extractor of a
    * topic/quality triage pass. tf = the term's count in the document;
    * idf = ln((N + 1) / (df + 1)) with df = documents containing the
    * term (smoothed so corpus-universal terms score ~0 instead of
    * dividing by zero); score = round(tf · idf, 6), ranked descending
    * with ties to the lexicographically smaller term, exactly k kept
    * (fewer only when the document has fewer distinct terms).
    *
    * Shape: one exploded-token (id, term) count, one term-keyed df
    * aggregate joined back on the term (term cardinality ≪ token
    * count; AQE broadcasts it when small), N as a broadcast 1-row
    * aggregate (lazy — no job at plan construction), one per-document
    * top-k window that plans as WindowGroupLimit (top-k prunes before
    * materialization). Empty tokens are dropped, so a blank document
    * contributes no rows on either engine. */
  def tfIdfTopTerms(df: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1, got $k")
    val tf = df
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("__N"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("score").desc, col("term").asc)
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score", round(col("tf").cast(DoubleType) *
        log((col("__N") + 1).cast(DoubleType) / (col("df") + 1)), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("score"), col("rank"))
  }

  /** BM25 top-k retrieval — the sparse complement to the dense ANN path
    * (`Similarity`): for each keyword query, the k best-matching
    * documents under Okapi/Lucene BM25. Query terms are the same
    * whitespace tokens as the corpus side (duplicates in a query count
    * once); per matching term the contribution is
    * `idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))` with the
    * non-negative Lucene idf `ln(1 + (N − df + 0.5)/(df + 0.5))`,
    * dl = the document's token count, avgdl = total corpus tokens / N
    * (blank documents count in N, contribute 0 tokens); a document's
    * score is `round(sum over its matching terms, 6)`, ranked
    * descending with ties to the smaller document id.
    *
    * Scale shape: the query set is driver-literal and tiny, so every
    * query-side join is a BROADCAST — the corpus is never shuffled by
    * anything query-sized. dl is a scan-level expression that rides the
    * token explode into the one (doc, term) count exchange (no separate
    * corpus-keyed length join); tf is immediately semi-restricted to
    * query terms by that broadcast, so df, the scoring join, and the
    * final (query, doc) aggregate all run on candidate rows only
    * (docs sharing ≥1 query term), not the corpus; N and the token
    * total are one lazy broadcast 1-row aggregate; top-k plans as
    * WindowGroupLimit per query. Hot term = hot shuffle key, split by
    * AQE like any aggregate. */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
               queries: Seq[(Int, String)], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1, got $k")
    require(queries.nonEmpty, "bm25TopK needs at least one query")
    require(k1 >= 0 && b >= 0 && b <= 1, s"k1 >= 0 and 0 <= b <= 1, got k1=$k1 b=$b")
    val spark = df.sparkSession
    import spark.implicits._
    val qterms = queries.toDF("query_id", "__qtext")
      .select(col("query_id"), explode(tokens(col("__qtext"))).as("term"))
      .filter(col("term") =!= "")
      .distinct()
    val tf = df
      .select(col(idCol), col(textCol),
        size(filter(tokens(col(textCol)), _ =!= "")).as("dl"))
      .select(col(idCol), col("dl"), explode(tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
      .join(broadcast(qterms.select("term").distinct()), Seq("term"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = df.agg(
      count(lit(1)).as("__N"),
      sum(size(filter(tokens(col(textCol)), _ =!= "")))
        .cast(DoubleType).as("__toks"))
    val idf = log(lit(1.0) +
      (col("__N") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val norm = col("tf") + lit(k1) *
      (lit(1.0 - b) + lit(b) * col("dl") / (col("__toks") / col("__N")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col(idCol).asc)
    tf.join(dfreq, Seq("term"))
      .join(broadcast(qterms), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("__c", idf * col("tf") * lit(k1 + 1.0) / norm)
      .groupBy(col("query_id"), col(idCol))
      .agg(round(sum(col("__c")), 6).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol), col("score"), col("rank"))
  }

  /** Top-k collocations (adjacent token bigrams) by pointwise mutual
    * information — the phrase detector of a vocabulary/tokenizer
    * analysis pass: `pmi = ln((c_ab/B) / ((c_a/T) · (c_b/T)))` with
    * c_ab = the bigram's corpus count, c_a/c_b = unigram counts,
    * B/T = total bigram/token counts; bigrams below `minCount` are
    * noise and dropped before scoring, k best kept globally (pmi
    * descending, ties to the lexicographically smaller pair), score
    * rounded to 6.
    *
    * Scale shape: bigram pairs come from a scan-level index explode
    * (`element_at(toks, i)`/`i+1` — no self-join, no shuffle to form
    * pairs), then ONE (a,b)-keyed count exchange; the unigram side is
    * vocabulary-sized (≪ token count — AQE broadcasts it when small,
    * a term-keyed shuffle join otherwise, either way bounded by vocab
    * not corpus); B and T are one lazy broadcast 1-row aggregate; the
    * global top-k plans as TakeOrderedAndProject (per-partition k then
    * driver merge — never a single-partition global sort). */
  def pmiCollocations(df: DataFrame, textCol: String, minCount: Long,
                      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1, got $k")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val toks = filter(tokens(col(textCol)), _ =!= "")
    val uni = df.select(explode(toks).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
    val big = df.select(toks.as("__toks"))
      // Spark's sequence(start > stop) DESCENDS — a 0/1-token document
      // would yield bogus indices, so short docs are filtered out first
      .filter(size(col("__toks")) >= 2)
      .select(col("__toks"), explode(sequence(lit(1), size(col("__toks")) - 1)).as("i"))
      .select(element_at(col("__toks"), col("i")).as("a"),
        element_at(col("__toks"), col("i") + 1).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    val totals = df.agg(
      sum(size(toks)).cast(DoubleType).as("__T"),
      sum(greatest(size(toks) - 1, lit(0))).cast(DoubleType).as("__B"))
    val pmi = log((col("c_ab") / col("__B")) /
      ((col("c_a") / col("__T")) * (col("c_b") / col("__T"))))
    big
      .join(uni.select(col("t").as("a"), col("c").as("c_a")), Seq("a"))
      .join(uni.select(col("t").as("b"), col("c").as("c_b")), Seq("b"))
      .crossJoin(broadcast(totals))
      .select(col("a"), col("b"), col("c_ab"), round(pmi, 6).as("pmi"))
      .orderBy(col("pmi").desc, col("a").asc, col("b").asc)
      .limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("pmi").desc, col("a").asc, col("b").asc)))
  }
}
