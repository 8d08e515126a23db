package graft.tools

import org.apache.spark.sql.functions._

/** Scale-growth smoke for the round-11 operators:
  *
  *  - **WordPiece encode** (`graft_wp_tokens` over the canonical
  *    vocab): a scan-level expression with a per-task word cache —
  *    claim: wall grows LINEARLY with corpus size (no shuffle at all);
  *  - **rate-limited frontier** (`Crawl.rateLimitedFrontier`): the
  *    q158 shape grown mult× in links while hosts stay fixed — claim:
  *    the declared-delay budget join adds only a broadcast post-filter
  *    to `frontier`'s map-side-collapsing cost (near-linear wall);
  *  - **HITS vs PageRank** (`Crawl.hits` / `Crawl.pageRank`, 3
  *    iterations each): the same synthetic skewed graph grown mult× in
  *    EDGES — claim: both are dominated by the one-time edge shuffle +
  *    per-iteration partial-agg exchanges, so their walls track each
  *    other and grow sub-linearly once the fixed per-iteration
  *    overhead amortizes.
  *
  * Results are recorded in SCALE.md (round-11 section).
  * Usage: scripts/run.sh graft.tools.Round11Scale [baseRows] [mults...]
  */
object Round11Scale {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val base = args.headOption.map(_.toLong).getOrElse(100000L)
    val mults = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(1, 4, 16)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    val vocab = graft.SparkEntry.wpCanonicalVocab
    // a synthetic word stream drawn from the trained vocab's own
    // merge products plus noise words (exercises match AND unk paths)
    val words = Seq("window", "custom", "filter", "join", "column",
      "aggregate", "the", "quick", "dup", "slow", "zzzq", "row")
    val wordArr = array(words.map(lit): _*)

    for (m <- mults) {
      val n = base * m
      println(s"-- mult $m ($n rows) --")

      // WordPiece: ~24-word docs. Each word carries a per-doc 3-letter
      // suffix, so words are DISTINCT across docs and the per-task word
      // cache cannot flatten the curve (an earlier 12-distinct-word
      // fixture measured flat wall — pure cache hits; real corpora are
      // Zipf, between the two, and the honest claim is linearity in
      // UNCACHED words)
      val sfx = concat(
        chr(pmod(col("id"), lit(26L)) + 97),
        chr(pmod(col("id") / 26, lit(26L)) + 97),
        chr(pmod(col("id") / 676, lit(26L)) + 97),
        chr(pmod(col("id") / 17576, lit(26L)) + 97))
      val docs = spark.range(n).select(
        concat_ws(" ", (0 until 24).map(i =>
          concat(element_at(wordArr, (pmod(col("id") * 31 + i * 7, lit(12L)) + 1)
            .cast("int")), sfx)): _*).as("text"))
      // warm once (JIT/codegen), then min-of-2 timed draws — this
      // host's ambient swing otherwise owns single-shot numbers
      def wpRun() = docs.select(
          sum(size(graft.operators.TextAnalysis
            .wordPieceTokens(col("text"), vocab))).as("s"))
        .head().getLong(0)
      wpRun()
      time(s"wp encode x$m (a)")(wpRun())
      time(s"wp encode x$m (b)")(wpRun())

      // rate-limited frontier: skewed link pile over 2000 hosts, robots
      // with declared delays on half the hosts
      val hosts = 2000
      val h = pmod(xxhash64(col("id")), lit(20000L))
      val page = (h * h / 20000L).cast("long")
      val host = pmod(page, lit(hosts.toLong)).cast("string")
      val links = spark.range(n).select(
        concat(lit("https://h"), host, lit(".example/p/"),
          page.cast("string")).as("href"))
      val robots = spark.range(hosts / 2).select(
        concat(lit("h"), (col("id") * 2).cast("string"), lit(".example"))
          .as("host"),
        concat(lit("User-agent: *\nCrawl-delay: "),
          (pmod(col("id"), lit(7L)) + 1).cast("string")).as("txt"))
      time(s"rate frontier x$m") {
        graft.operators.Crawl.rateLimitedFrontier(links, "href",
          Seq.empty[String].toDF("url"), Nil, robots, "host", "txt",
          "graftbot", windowSec = 60.0, defaultDelaySec = 10.0,
          maxPerHost = 50).count()
      }

      // HITS vs PageRank on the same growing graph (nodes fixed at 50k,
      // edges grow with n: multi-edges collapse, so distinct edges
      // saturate — both should flatten once the graph stops growing)
      val nodes = 50000L
      val edges = spark.range(n).select(
        pmod(xxhash64(col("id")), lit(nodes)).as("src"),
        pmod(xxhash64(col("id") * 31 + 7), lit(nodes)).as("dst"))
      time(s"hits x$m") {
        graft.operators.Crawl.hits(edges, "src", "dst", iterations = 3)
          .agg(sum("auth")).head()
      }
      time(s"pagerank x$m") {
        graft.operators.Crawl.pageRank(edges, "src", "dst", iterations = 3)
          .agg(sum("rank")).head()
      }
    }
    spark.stop()
  }
}
