package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

/** Scale-growth smoke for the dedup paths: replicates the documents
  * corpus N× with a shingle-disjoint perturbation (every inter-token gap
  * gets a replica-unique marker token, so no shingle is shared across
  * replicas) — cluster structure per replica is preserved while corpus
  * size grows, which is exactly the regime a 100 TB dedup run lives in
  * (bounded duplication, growing corpus). A bucketed candidate design
  * must then scale near-linearly in N; anything quadratic in corpus size
  * (all-pairs, fixed-cardinality blocking) blows up immediately.
  *
  * Usage: scripts/run.sh graft.tools.ScaleSmoke [sfDir] [mults...]
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mults = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 4, 16)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def replicated(n: Int) =
      docs.withColumn("rep", explode(sequence(lit(0), lit(n - 1))))
        .select(
          (col("doc_id") * n + col("rep")).as("doc_id"),
          // suffix every token with the replica id: token frequencies
          // WITHIN a replica are isomorphic to the original document
          // (near-dup structure preserved), while no token — hence no
          // shingle, no simhash weight — is shared ACROSS replicas.
          // (A constant marker token inserted per gap would instead make
          // the marker dominate every document's simhash and turn the
          // corpus into one all-pairs near-dup cluster.)
          array_join(transform(split(trim(col("text")), "\\s+"),
            t => concat(t, lit("_"), col("rep"))), " ").as("text"))

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    // SPARK_GRAFT_SCALE_ONLY=comma,separated,substrings runs a subset of
    // legs (dev aid: re-measure one curve without the full hour).
    // Containment is SYMMETRIC so both a gate prefix ("annTopK" enables
    // the whole ANN loop) and a copied printed label ("annTopKIvf" —
    // more specific than the loop gate) select the leg.
    val only = sys.env.get("SPARK_GRAFT_SCALE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def enabled(name: String): Boolean =
      only.forall(_.exists(p => name.contains(p) || p.contains(name)))
    def timeIf(label: String)(f: => Long): Long =
      if (enabled(label)) time(label)(f) else -1L

    // every leg label of the doc-corpus loop below: skip the (expensive)
    // replicated persist+count entirely when none is selected
    val docLegs = Seq("minhashCandidates", "simhashBandPairs",
      "simhashMankuPairs", "dedupClusters", "removeBoilerplate",
      "contamination", "mixtureSample", "dupSpans", "bigramLm",
      "bloomDedup", "classifierTrain", "heavyHitters", "kmvDistinct",
      "kmvByGroup", "htmlExtract")
    for (n <- mults if docLegs.exists(enabled)) {
      val d = replicated(n).persist()
      val total = d.count()
      println(s"mult=$n  docs=$total")
      val pairs = timeIf("minhashCandidates") {
        Dedup.minhashCandidates(d, "doc_id", "text").filter(col("jaccard") >= 0.5).count()
      }
      val simhash = timeIf("simhashBandPairs") {
        Dedup.simhashBandPairs(d, "doc_id", "text", bands = 4, maxHamming = 3).count()
      }
      val manku = timeIf("simhashMankuPairs") {
        Dedup.simhashMankuPairs(d, "doc_id", "text",
          blocks = 6, keyBlocks = 3, maxHamming = 3, bits = 60).count()
      }
      val clusters = timeIf("dedupClusters") {
        Dedup.dedupClusters(d, "doc_id", "text", threshold = 0.5)
          .filter(col("keep")).count()
      }
      // boilerplate leg: every replica-group of ~docs/20 docs shares a
      // footer line (replica-suffixed, so the frequent-line SET grows
      // linearly with mult while per-line doc counts stay constant —
      // the growth axis that stresses the broadcast flag join)
      val boiler = timeIf("removeBoilerplate") {
        val aug = d.withColumn("t", concat(
          col("text"),
          lit("\nsubscribe "), substring(col("text"), 1, 8),
          lit("\nunique "), col("doc_id").cast("string")))
        Dedup.removeBoilerplate(aug, "doc_id", "t", minDocs = 10L)
          .agg(sum(col("n_removed"))).head().getLong(0)
      }
      // contamination leg: the eval/benchmark set is FIXED (20 docs drawn
      // from replica 0) while the corpus grows mult× — the production
      // regime (benchmarks don't grow with the corpus). The broadcast
      // payload is the eval shingle set, whose size is printed as the
      // bound evidence: it must stay constant across mults while wall
      // grows ~linearly (one scan + one keyed count-aggregate).
      var benchShingles = -1L
      var contaminated = -1L
      if (enabled("contamination")) {
        val bench = d.filter(col("doc_id") % n === 0).limit(20).persist()
        benchShingles = bench // broadcast-bound evidence, untimed
          .select(explode(array_distinct(graft.operators.TextAnalysis
            .wordShingles(col("text"), 3))).as("s"))
          .distinct().count()
        contaminated = time("contamination") {
          Dedup.contamination(d, bench, "doc_id", "text", minOverlap = 5L).count()
        }
        bench.unpersist()
      }
      // mixtureSample leg: group count is FIXED (3 sources) while rows
      // grow mult× — coordination is one count-aggregate whose result is
      // group-count-sized (3 rows, driver-held) at every mult; the
      // sampling itself is a scan-level hash predicate, so wall must
      // track the scan ~linearly.
      val mixKept = timeIf("mixtureSample") {
        val mix = docs
          .withColumn("rep", explode(sequence(lit(0), lit(n - 1))))
          .select((col("doc_id") * n + col("rep")).as("doc_id"), col("source"))
        graft.operators.Sampling.mixtureSample(mix, "source", "doc_id",
          Map("src0" -> 3.0, "src1" -> 1.0, "src2" -> 1.0)).count()
      }
      // heavy-hitters leg: replica-suffixed tokens split every original
      // token's share across n distinct variants, so phi scales 1/n to
      // keep the answer population comparable; MG summaries stay
      // per-partition-bounded (ceil(1/phi) counters) and the confirm
      // exchange candidate-bounded — wall must track the two scans
      // ~linearly, never the distinct-universe size
      val hhRows = timeIf("heavyHitters") {
        val toks = d.select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
          .filter(col("tok") =!= "")
        graft.operators.Profiling.heavyHitters(toks, col("tok"), 0.002 / n).count()
      }
      // html leg: the fixture markup per doc is constant-size and the
      // payload text grows with the corpus; extraction + link harvest
      // are pure per-row expression chains, so wall must track the scan
      // ~linearly — the aggregate is ONE row (total extracted chars +
      // harvested links), nothing doc-sized leaves the executors
      val htmlChars = timeIf("htmlExtract") {
        graft.operators.Html.syntheticPages(d.withColumn("lang", lit("en")))
          .agg((sum(length(graft.operators.Html.extractText(col("html")))) +
            sum(size(graft.operators.Html.links(col("html"))))).as("t"))
          .head().getLong(0)
      }
      // KMV legs: the distinct shingle universe grows ~linearly in mult
      // while the sketch exchange stays (partitions x k)-bounded — wall
      // must be scan-bound; the per-group native aggregate adds only a
      // group-keyed partial/final pair with <= k longs per group state
      val kmvEst = timeIf("kmvDistinct") {
        val sh = d.select(explode(TextAnalysis.wordShingles(col("text"), 3)).as("s"))
        Dedup.distinctCount(sh, col("s"), 1024).head().getDouble(2).toLong
      }
      val kmvGroups = timeIf("kmvByGroup") {
        val sh = d.select((col("doc_id") % 16).as("g"),
          explode(TextAnalysis.wordShingles(col("text"), 3)).as("s"))
        graft.operators.Profiling.distinctByGroup(sh, Seq(col("g")), col("s"), 512).count()
      }
      // span-dedup leg: replicas are token-disjoint, so duplicated spans
      // stay within-replica and must grow EXACTLY linearly in mult; the
      // sampled variant (content-defined hash % 8) must track the same
      // shape at ~1/8 the shuffled window volume
      val spanRows = timeIf("dupSpansExact") {
        Dedup.duplicateSpans(d, "doc_id", "text", k = 10).count()
      }
      val spanSampled = timeIf("dupSpansSampled8") {
        Dedup.duplicateSpans(d, "doc_id", "text", k = 10, sampleMod = 8).count()
      }
      // bloom-dedup leg: the daily batch is FIXED (100 docs, half dup
      // keys / half novel) while the history grows mult× — the production
      // increment regime. Build (one history scan into a constant-size
      // bitset, persisted across increments in production) and probe
      // (scan-level might-contain + broadcast confirm over history) are
      // timed separately; each must track the history scan ~linearly
      // with the dropped count CONSTANT (the dup half of the batch),
      // proving the exchanged volume is candidate-sized, not history-
      // sized, at every mult.
      var bloomDropped = -1L
      if (enabled("bloomDedup")) {
        val keyedHist = d.withColumn("__k", substring(col("text"), 1, 40))
        val batch = d.filter(col("doc_id") % n === 0).limit(100)
          .select(col("doc_id"),
            // parity of the ORIGINAL id (replicated id = orig*n + rep):
            // orig even <=> orig*n % 2n == 0 at any mult, odd n included
            when(col("doc_id") % (2L * n) === 0, col("text"))
              .otherwise(concat(lit("novel-"), col("doc_id"), lit(" "),
                col("text"))).as("text"))
          .withColumn("__k", substring(col("text"), 1, 40)).persist()
        batch.count()
        var bloom: Array[Byte] = null
        time("bloomDedupBuild") {
          bloom = Dedup.bloomBuild(keyedHist, "__k"); bloom.length.toLong
        }
        bloomDropped = time("bloomDedupProbe") {
          100 - Dedup.bloomDedupWith(batch, keyedHist, "__k", bloom).count()
        }
        batch.unpersist()
      }
      // classifier-train leg: two integer-GD iterations over the whole
      // corpus at a FIXED model size (dim=1024) — per iteration one
      // doc-keyed and one bucket-keyed aggregate over the hashed-feature
      // rows, so wall must track the corpus ~linearly while the driver
      // never holds more than the dim-sized model
      val clsfNonZero = timeIf("classifierTrain") {
        val labeled = d.withColumn("y", (col("doc_id") % 2).cast("long"))
        graft.operators.TextAnalysis.trainHashClassifier(
          labeled, "doc_id", "text", "y", dim = 1024, iters = 2)
          .count(_ != 0L).toLong
      }
      // bigram-LM leg: the model trains on a FIXED reference slice
      // (replica 0 only — reference corpora don't grow with the crawl)
      // while scoring sweeps the whole corpus. The model tables stay
      // byte-identical across mults (printed as the bound evidence);
      // wall must track the corpus scan ~linearly.
      val lmScored = timeIf("bigramLm") {
        val scored = graft.operators.TextAnalysis.bigramLmScore(
          d, "doc_id", "text", modelFilter = col("doc_id") % n === 0)
        scored.filter(col("avg_logp").isNotNull).count()
      }
      println(s"  pairs=$pairs simhashPairs=$simhash mankuPairs=$manku " +
        s"keepers=$clusters boilerRemoved=$boiler " +
        s"contaminated=$contaminated benchShingles=$benchShingles mixKept=$mixKept " +
        s"dupSpans=$spanRows dupSpansSampled=$spanSampled lmScored=$lmScored " +
        s"bloomDropped=$bloomDropped clsfNonZero=$clsfNonZero " +
        s"heavyHitters=$hhRows kmvEst=$kmvEst kmvGroups=$kmvGroups " +
        s"htmlChars=$htmlChars")
      d.unpersist()
    }

    // ---- SemDeDup leg: embeddings replicated with a replica-unique
    // SIGN FLIP per dimension (s_i ∈ {±1} from hash(rep, dim)). Within a
    // replica cos(s⊙x, s⊙y) = cos(x, y) EXACTLY (s_i² = 1) — near-dup
    // structure preserved — while cross-replica vectors decorrelate
    // (random sign agreement ⇒ cos ≈ 0): the embedding analog of the
    // shingle-disjoint document perturbation above. nlist scales as
    // sqrt(n) (the FAISS rule): centroid assignment costs n × nlist and
    // within-cell pairs cost n × (n/nlist) — sqrt balances both at
    // O(n^1.5), the true cost profile of centroid-based SemDeDup (the
    // paper runs its k-means on GPUs; OUR constant-per-row scale path
    // for semantic near-dup is the banded sign-LSH of q25). Caveat on
    // keeper counts: the sign flip decorrelates replicas only to
    // cos ~ N(0, ~1/sqrt(d)) with tails fattened by uneven feature
    // weights, so at thresholds near the noise floor some CROSS-replica
    // pairs leak into the dominance set — the wall/plan scaling is the
    // claim here, not exact keeper linearity.
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def embReplicated(n: Int) =
      emb.withColumn("rep", explode(sequence(lit(0), lit(n - 1))))
        .select(
          (col("vec_id") * n + col("rep")).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            when(pmod(hash(col("rep"), i), lit(2)) === 0, x).otherwise(-x))
            .as("embedding"))
    for (n <- mults if enabled("semDedup")) {
      val e = embReplicated(n).persist()
      val total = e.count()
      val nlist = math.max(16, math.sqrt(total.toDouble).toInt)
      val keepers = time(s"semDedup(nlist=$nlist)") {
        Dedup.semDedup(e, "vec_id", "embedding", threshold = 0.4, nlist = nlist)
          .filter(col("keep")).count()
      }
      println(s"mult=$n  vecs=$total  semKeepers=$keepers")
      e.unpersist()
    }

    // ---- semDedup hot-cell skew leg ("hotCell"): a deliberately
    // clustered corpus — every vector is a tiny perturbation of ONE
    // direction, so assignment puts essentially everything into a single
    // cell no matter the nlist. Without the cellCap tile guard the whole
    // O(n²) pairwise stage lands on ONE task; with it the pair space is
    // tiled across ~(n/cap)² tasks and wall time is bounded by
    // pairs/parallelism. Guarded and unguarded walls are printed side by
    // side at each mult; the answer is asserted identical.
    def clustered(n: Int) =
      emb.withColumn("rep", explode(sequence(lit(0), lit(n - 1))))
        .select((col("vec_id") * n + col("rep")).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            when(i === 0, lit(1.0f)).otherwise(
              (pmod(hash(col("vec_id") * lit(37) + i), lit(1000))
                .cast("float") / lit(1000000.0f)).cast("float")))
            .as("embedding"))
    for (n <- mults if enabled("hotCell")) {
      val e = clustered(n).persist()
      val total = e.count()
      val guarded = time(s"hotCellGuarded(cap=4096)") {
        Dedup.semDedup(e, "vec_id", "embedding", threshold = 0.99, nlist = 16)
          .filter(col("keep")).count()
      }
      val unguarded = time("hotCellUnguarded") {
        Dedup.semDedup(e, "vec_id", "embedding", threshold = 0.99, nlist = 16,
          cellCap = Int.MaxValue).filter(col("keep")).count()
      }
      assert(guarded == unguarded,
        s"skew guard changed the answer: $guarded vs $unguarded")
      println(s"mult=$n  vecs=$total  hotCellKeepers=$guarded")
      e.unpersist()
    }

    // ---- ANN leg: the query batch is FIXED (20 vectors from replica 0)
    // while the corpus grows mult× — the production ANN regime (a bounded
    // probe batch against a growing index). Brute-force cosine is the
    // exact baseline and must grow ~linearly in n (q × n scored pairs,
    // q constant); IVF with nlist = sqrt(n), nprobe = 4 scores
    // n × nlist assignment cosines ONCE per corpus plus only the probed
    // cells' rerank pairs — its candidate count (printed) must grow
    // sublinearly vs brute's q × n. Both sides stay broadcast-shaped:
    // the query batch (and IVF's probe fan-out, q × nprobe rows) is
    // driver-bounded no matter the corpus size.
    for (n <- mults if enabled("annTopK")) {
      import graft.operators.Similarity
      val e = embReplicated(n).persist()
      val total = e.count()
      val queries = e.filter(col("vec_id") % n === 0).limit(20).persist()
      queries.count() // materialize before timing the search itself
      val brute = timeIf("annTopKBrute") {
        Similarity.bruteForceTopK(queries, e, "vec_id", "embedding", k = 10).count()
      }
      // IVF split build/probe: the n × nlist assignment is the ONE-TIME
      // index-build cost (persisted in production, like the q68 minhash
      // index); the per-batch cost is the probe. A combined timing
      // charges every 20-query batch for the whole index build and makes
      // IVF read slower than brute force at any bounded batch size.
      val nlist = math.max(16, math.sqrt(total.toDouble).toInt)
      var ivfIdx: Similarity.IvfIndex = null
      val ivfBuildN = timeIf("annTopKIvfBuild") {
        ivfIdx = Similarity.ivfBuild(e, "vec_id", "embedding", nlist)
        ivfIdx = ivfIdx.copy(assigned = ivfIdx.assigned.persist())
        ivfIdx.assigned.count()
      }
      val ivf = if (ivfIdx == null) -1L else timeIf("annTopKIvfProbe") {
        Similarity.ivfProbe(ivfIdx, queries, "vec_id", "embedding",
          k = 10, nprobe = 4).count()
      }
      if (ivfIdx != null) ivfIdx.assigned.unpersist()
      println(s"mult=$n  vecs=$total  bruteTopK=$brute ivfAssigned=$ivfBuildN " +
        s"ivfTopK=$ivf nlist=$nlist")
      queries.unpersist(); e.unpersist()
    }

    // ---- temporal-join leg ("asofJoin"/"rangeJoin"): events replicated
    // N× with replica-unique users AND a per-replica time shift larger
    // than any window — per-key history and window populations stay
    // constant while keys/rows grow (the bounded regime of a growing
    // event log). asofJoin is one keyed exchange + sort, so wall must
    // track rows ~linearly with output rows EXACTLY linear; rangeJoin's
    // bucketized pair space is confined within replicas by the shift, so
    // matched pairs are exactly linear too — anything quadratic (the
    // theta-join formulations both operators replace) blows up instead.
    lazy val events = graft.Tables(spark, sfDir, "events")
    def evReplicated(n: Int) = {
      val span = 32L * 86400L * 1000000L // > the fixture's 30-day spread
      events.withColumn("rep", explode(sequence(lit(0), lit(n - 1))))
        .select(
          (col("event_id") * n + col("rep")).as("event_id"),
          timestamp_micros(unix_micros(col("ts")) + col("rep") * span).as("ts"),
          (col("user_id") * n + col("rep")).as("user_id"),
          col("event_type"), col("value"))
    }
    for (n <- mults if Seq("asofJoin", "rangeJoin").exists(enabled)) {
      import graft.operators.Joins
      val ev = evReplicated(n).persist()
      val total = ev.count()
      val asofMatched = timeIf("asofJoin") {
        Joins.asofJoin(
          ev.filter(col("event_type") === "purchase")
            .select("event_id", "ts", "user_id", "value"),
          ev.filter(col("event_type") === "click"),
          Seq("user_id"), "ts", "ts", Seq("event_id", "value"), "event_id")
          .filter(col("asof_event_id").isNotNull).count()
      }
      val rangePairs = timeIf("rangeJoin") {
        val win = 600L * 1000000L
        val errs = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("err_id"), col("ts").as("win_start"),
            timestamp_micros(unix_micros(col("ts")) + win).as("win_end"))
        val buys = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("buy_id"), col("ts").as("buy_ts"))
        Joins.rangeJoin(buys, "buy_ts", errs, "win_start", "win_end", win).count()
      }
      println(s"mult=$n  events=$total  asofMatched=$asofMatched " +
        s"rangePairs=$rangePairs")
      ev.unpersist()
    }

    // ---- PQ leg ("pqEncode"/"pqAdc"): the codebook trains on a FIXED
    // slice (replica 0 — the model does not grow with the corpus) while
    // encode sweeps the whole corpus (n × m slice-argmin rows off a
    // broadcast codebook — must track rows ~linearly) and the ADC probe
    // serves a FIXED 20-query batch against the full code table (q × n
    // × m integer lookups, q constant — linear in n, never touching a
    // full vector). Code-table rows are printed as the compression
    // evidence: m small ints per vector at every mult.
    for (n <- mults
         if Seq("pqEncode", "pqAdc", "ivfPqAppendBatch").exists(enabled)) {
      import graft.operators.Similarity
      val e = embReplicated(n).persist()
      val total = e.count()
      val cb = Similarity.pqTrain(e.filter(col("vec_id") % n === 0),
        "vec_id", "embedding", dim = 64, m = 8, ksub = 32, iters = 2)
      var codes: org.apache.spark.sql.DataFrame = null
      val codeRows = timeIf("pqEncode") {
        codes = Similarity.pqCodes(e, "vec_id", "embedding", cb).persist()
        codes.count()
      }
      val adc = if (codes == null) -1L else timeIf("pqAdc") {
        val queries = e.filter(col("vec_id") % n === 0).limit(20)
        Similarity.pqAdcTopK(queries, codes, "vec_id", "embedding", cb, k = 10)
          .count()
      }
      if (codes != null) codes.unpersist()
      // incremental-append leg: HISTORY grows mult x while the appended
      // batch stays FIXED (replica 0) — the O(batch) claim is that the
      // append's encode wall stays ~flat as history grows (the history
      // code table is only unioned, never re-encoded; the count() at the
      // end scans both, so the flat part is isolated by timing the
      // batch encode alone)
      val appendWall = timeIf("ivfPqAppendBatch") {
        val batch = e.filter(col("vec_id") % n === 0) // rep-0: FIXED size
        val seeds = Similarity.kmeansTrain(batch, "vec_id", "embedding",
          nlist = 8, iters = 0)
        val history = Similarity.ivfPqBuild(
          e.filter(col("vec_id") % n =!= 0), "vec_id", "embedding", seeds, cb)
        // time ONLY what ivfPqAppend adds to the plan: the batch-side
        // encode (its union with history.codes is lazy metadata — an
        // exceptAll/count over the union would re-scan history and
        // measure the wrong thing)
        Similarity.ivfPqBuild(batch, "vec_id", "embedding",
          history.seeds, history.cb).codes.count()
      }
      println(s"mult=$n  vecs=$total  pqCodeRows=$codeRows  adcTopK=$adc " +
        s"appendEncodeRows=$appendWall")
      e.unpersist()
    }

    // ---- k-means training leg ("kmeansTrain"): per-iteration cost is
    // one broadcast-join assignment (n × nlist cosines, map-side
    // argmax) plus one (n × dim)-row component aggregate — both
    // ~linear in n at the sqrt(n) nlist rule; the driver never holds
    // more than the nlist × dim model. Balance evidence: max cell
    // population under the md5-seed table vs the trained table —
    // trained centroids sit at cluster means, so populations tighten
    // toward n/nlist (the structural complement to semDedup's cellCap
    // tile guard, which bounds the worst case training can't rule out).
    for (n <- mults if enabled("kmeansTrain")) {
      import graft.operators.Similarity
      val e = embReplicated(n).persist()
      val total = e.count()
      val nlist = math.max(16, math.sqrt(total.toDouble).toInt)
      var trained: Seq[(Long, Seq[Float])] = null
      time(s"kmeansTrain(nlist=$nlist,it=2)") {
        trained = Similarity.kmeansTrain(e, "vec_id", "embedding", nlist, iters = 2)
        trained.size.toLong
      }
      def maxPop(idx: Similarity.IvfIndex): Long =
        idx.assigned.groupBy("cell").count().agg(max("count")).head().getLong(0)
      val seedMax = maxPop(Similarity.ivfBuild(e, "vec_id", "embedding", nlist))
      val trainedMax = maxPop(Similarity.ivfBuildWith(e, "vec_id", "embedding", trained))
      println(s"mult=$n  vecs=$total  nlist=$nlist  maxCellSeed=$seedMax  " +
        s"maxCellTrained=$trainedMax  evenSplit=${total / nlist}")
      e.unpersist()
    }

    // BM25 leg: corpus replicated n× with text UNCHANGED (unlike the
    // token-suffixed near-dup replication above) so every query term's
    // candidate set grows n× — the axis that stresses the candidate-side
    // exchanges. Wall must grow ~linearly; the query side stays a
    // constant broadcast regardless of mult.
    if (enabled("bm25TopK")) {
      for (n <- mults) {
        val rep = docs.withColumn("rep", explode(sequence(lit(0), lit(n - 1))))
          .select((col("doc_id") * n + col("rep")).as("doc_id"), col("text"))
        time(s"bm25TopK x$n") {
          TextAnalysis.bm25TopK(rep, "doc_id", "text",
            Seq(1 -> "spark window join", 2 -> "hash merge sort stream"),
            k = 10).count()
        }
      }
    }
    spark.stop()
  }
}
