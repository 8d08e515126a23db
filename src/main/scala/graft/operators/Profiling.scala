package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

/** Corpus-frequency profiling operators that stay EXACT while keeping
  * every exchange bounded — the pre-flight analyses of a curation run
  * ("which domains dominate the crawl?", "how many distinct shingles
  * per language?") that naive `GROUP BY` answers with an exchange sized
  * by the distinct universe.
  */
object Profiling {

  /** EXACT φ-heavy hitters: every value of `expr` whose frequency is at
    * least `ceil(minFraction · N)` over the non-null rows, with its
    * exact count — never a false positive, never a miss.
    *
    * Two-phase plan (the classical distributed frequent-items shape):
    *
    *   1. CANDIDATES — each partition runs a Misra–Gries summary with
    *      k = ⌈1/φ⌉ counters (bounded memory, one pass, nothing
    *      shuffled). MG guarantees every item with local frequency
    *      > n_p/(k+1) survives its partition; an item with GLOBAL
    *      frequency ≥ φ·N has local frequency ≥ φ·n_p in at least one
    *      partition (pigeonhole), and φ > 1/(k+1) by choice of k — so
    *      the union of partition candidates is a SUPERSET of the true
    *      heavy hitters. At most partitions × k candidate keys total.
    *   2. CONFIRM — exact counts restricted to the candidate set: the
    *      bounded candidate list is broadcast, matching rows hash-
    *      aggregate with map-side combine (the exchange carries at most
    *      partitions × |candidates| partial rows), and the φ·N
    *      threshold filter drops the superset's false candidates.
    *
    * The input is scanned twice with columns (candidates, confirm) plus
    * a column-pruned count-only pass for N (parquet answers it from row
    * counts) — the price of exactness; every pass is embarrassingly
    * parallel and none ever shuffles the full distinct universe, which
    * is what breaks
    * `GROUP BY value HAVING count >= t` at 100 TB when `value` has
    * billions of distincts (URLs, shingles). Output order is
    * unspecified (sort downstream if needed).
    *
    * Result is EXACT and partition-layout-independent: extra MG
    * candidates only add confirm work, never rows (the threshold filter
    * is exact), and true heavy hitters are always candidates. */
  def heavyHitters(df: DataFrame, expr: Column, minFraction: Double): DataFrame = {
    require(minFraction > 0 && minFraction <= 1,
      s"minFraction must be in (0, 1], got $minFraction")
    val spark = df.sparkSession
    import spark.implicits._
    val k = math.ceil(1.0 / minFraction).toInt
    val items = df.select(expr.cast(StringType).as("item"))
      .filter(col("item").isNotNull)
    val candidates = items.as[String].mapPartitions { it =>
      // Misra-Gries: k counters; a full summary meeting a new item
      // decrements ALL counters (amortized O(1) per row — each
      // decrement pays back an earlier increment)
      val counters = new java.util.HashMap[String, Long](k * 2)
      it.foreach { s =>
        val c = counters.get(s)
        if (c > 0L) counters.put(s, c + 1L)
        else if (counters.size < k) counters.put(s, 1L)
        else {
          val jt = counters.entrySet().iterator()
          while (jt.hasNext) {
            val e = jt.next()
            if (e.getValue == 1L) jt.remove() else e.setValue(e.getValue - 1L)
          }
        }
      }
      import scala.jdk.CollectionConverters._
      counters.keySet().iterator().asScala
    }.toDF("item").distinct()
    val total = items.agg(count(lit(1)).as("n_total"))
    items.join(broadcast(candidates), "item")
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") >= ceil(lit(minFraction) * col("n_total")))
      .select(col("item"), col("cnt"))
  }

  /** Key-skew diagnosis for a prospective join/groupBy key — the
    * pre-flight that decides whether a 100 TB shuffle needs
    * [[Joins.saltedEquiJoin]] / AQE skew handling BEFORE paying for it.
    * Returns ONE row of exact concentration statistics:
    *
    *   - `n_rows`, `n_keys`, `max_key_rows` — raw shape;
    *   - `top1_share`, `top10_share` — fraction of all rows owned by the
    *     heaviest key / heaviest 10 keys (ties broken by key value, so
    *     the number is deterministic): the direct "one task gets X% of
    *     the shuffle" reading;
    *   - `collision_prob` — Σ c·(c−1) / (N·(N−1)), the probability two
    *     random rows share a key (the Simpson/HHI concentration index):
    *     layout-independent, and exactly the pair-volume multiplier a
    *     self-join on this key pays.
    *
    * All integer aggregation until final IEEE divides over exact
    * operands — bit-identical cross-engine. Scale shape: one key-keyed
    * count exchange (map-side combine) feeding a scalar aggregate and a
    * TakeOrdered(10); the count frame is evaluated twice (scalar + top10
    * legs) — cache it upstream if the input scan dominates. */
  def keySkew(df: DataFrame, key: Column): DataFrame = {
    val counts = df.select(key.cast(StringType).as("k"))
      .filter(col("k").isNotNull)
      .groupBy("k").agg(count(lit(1)).as("c"))
    val scalar = counts.agg(
      sum("c").as("n_rows"),
      count(lit(1)).as("n_keys"),
      max("c").as("max_key_rows"),
      sum(col("c") * (col("c") - 1)).as("p2"))
    val top10 = counts.orderBy(col("c").desc, col("k").asc).limit(10)
      .agg(coalesce(sum("c"), lit(0L)).as("top10_rows"))
    scalar.crossJoin(top10).select(
      col("n_rows"), col("n_keys"), col("max_key_rows"),
      (col("max_key_rows").cast(DoubleType) / col("n_rows")).as("top1_share"),
      (col("top10_rows").cast(DoubleType) / col("n_rows")).as("top10_share"),
      when(col("n_rows") > 1,
        col("p2").cast(DoubleType) /
          (col("n_rows").cast(DoubleType) * (col("n_rows").cast(DoubleType) - 1)))
        .otherwise(lit(0.0)).as("collision_prob"))
  }

  /** Histogram-binned quantile estimates — the bounded-state scale path
    * where exact interpolated quantiles (q73; Spark `percentile`) buffer
    * every value of the group: `bins` fixed-width buckets over
    * [lo, hi), ONE bin-keyed count exchange (map-side combine, at most
    * `bins` rows ever shuffled), then each requested quantile is read
    * off the cumulative histogram with uniform-within-bin
    * interpolation. The estimate for quantile q (at fractional rank
    * t = q·(N−1), the `percentile_cont` position) lands in the same
    * bucket as the exact answer, so the error is bounded by ONE bin
    * width (spec-pinned) — tighten by adding bins, which costs bounded
    * rows, not memory per value.
    *
    * Values outside [lo, hi) clamp to the edge bins (the histogram
    * range is a declared contract, like any production metrics
    * histogram). All arithmetic is integer aggregation + the same IEEE
    * multiply/divide tree on both engines — bit-mirrorable. The
    * cumulative window runs over ≤ `bins` rows by construction, so its
    * single-partition execution is bounded, not a data-sized sort. */
  def binnedQuantiles(df: DataFrame, x: Column, lo: Long, hi: Long,
                      bins: Int, qs: Seq[Double]): DataFrame = {
    require(hi > lo, s"need hi > lo, got [$lo, $hi)")
    require(bins >= 1, s"bins must be >= 1, got $bins")
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must be in [0, 1], got $qs")
    val spark = df.sparkSession
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val v = df.select(x.cast("long").as("v")).filter(col("v").isNotNull)
    val binned = v.select(
        when(col("v") <= lo, lit(0L))
          .when(col("v") >= hi, lit((bins - 1).toLong))
          .otherwise(least(lit((bins - 1).toLong),
            floor((col("v") - lo) * bins / (hi - lo)).cast("long"))).as("b"))
      .groupBy("b").agg(count(lit(1)).as("c"))
    val cum = binned.withColumn("cum_before",
      coalesce(sum("c").over(
        Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val n = v.agg(count(lit(1)).as("n"))
    val w = (hi - lo).toDouble / bins
    qs.toDF("q")
      .crossJoin(broadcast(n))
      .withColumn("t", col("q") * (col("n") - 1))
      .join(broadcast(cum),
        col("t") >= col("cum_before") && col("t") < col("cum_before") + col("c"))
      .select(col("q"),
        (lit(lo) + (col("b") + (col("t") - col("cum_before")) / col("c")) *
          lit(w)).as("est"))
  }

  /** Per-GROUP [[binnedQuantiles]] — one histogram per group off a
    * single (group, bin)-keyed count exchange, the cumulative window
    * PARTITIONED by group (≤ `bins` rows per window partition — a real
    * keyed window, not the global variant's bounded single-partition
    * case), every group × quantile interpolated with the same
    * one-bin-width error bound. This is what corpus profiling (q73)
    * becomes at 100 TB: per-source length/token quantiles without
    * buffering any group's values. Groups are carried as one string key
    * column `g` (cast upstream columns as needed); output is
    * (g, q, est) rows, groups × |qs|. */
  def binnedQuantilesByGroup(df: DataFrame, group: Column, x: Column,
                             lo: Long, hi: Long, bins: Int,
                             qs: Seq[Double]): DataFrame = {
    require(hi > lo, s"need hi > lo, got [$lo, $hi)")
    require(bins >= 1, s"bins must be >= 1, got $bins")
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must be in [0, 1], got $qs")
    val spark = df.sparkSession
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val v = df.select(group.cast(StringType).as("g"), x.cast("long").as("v"))
      .filter(col("v").isNotNull && col("g").isNotNull)
    val binned = v.select(col("g"),
        when(col("v") <= lo, lit(0L))
          .when(col("v") >= hi, lit((bins - 1).toLong))
          .otherwise(least(lit((bins - 1).toLong),
            floor((col("v") - lo) * bins / (hi - lo)).cast("long"))).as("b"))
      .groupBy("g", "b").agg(count(lit(1)).as("c"))
    val cum = binned.select(col("g"), col("b"), col("c"),
      coalesce(sum("c").over(Window.partitionBy("g").orderBy("b")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("cum_before"),
      sum("c").over(Window.partitionBy("g")).as("n"))
    val w = (hi - lo).toDouble / bins
    qs.toDF("q")
      .crossJoin(cum)
      .withColumn("t", col("q") * (col("n") - 1))
      .filter(col("t") >= col("cum_before") && col("t") < col("cum_before") + col("c"))
      .select(col("g"), col("q"),
        (lit(lo) + (col("b") + (col("t") - col("cum_before")) / col("c")) *
          lit(w)).as("est"))
  }

  /** Per-group distinct-count estimates via the native bottom-k KMV
    * aggregate ([[graft.expressions.KmvDistinct]]): one ordinary
    * groupBy whose per-group state is a BOUNDED k-long sketch (map-side
    * partial aggregation ships at most k hashes per group per task),
    * where `COUNT(DISTINCT x)` ships the group's whole distinct set.
    * EXACT below k distincts, ±1/√k above. `expr` is hashed with the
    * engine-standard md5/hash60 so the estimate is SQL-mirrorable. */
  def distinctByGroup(df: DataFrame, groupCols: Seq[Column], expr: Column,
                      sketchK: Int = 1024): DataFrame = {
    require(sketchK >= 2, s"sketchK must be >= 2, got $sketchK")
    df.groupBy(groupCols: _*)
      .agg(call_function("graft_kmv_distinct",
        TextAnalysis.hash60(expr.cast(StringType)), lit(sketchK))
        .as("est_distinct"))
  }

  /** EXACT binary AUC — the quality-classifier evaluation metric (the
    * probability a random positive outscores a random negative),
    * computed distributed via the Mann–Whitney rank-sum identity with
    * textbook average-rank tie handling. One row out:
    * (n_pos, n_neg, auc).
    *
    * Derivation that keeps it bit-mirrorable: group rows by EXACT score
    * value (one key-keyed exchange with map-side combine → (score,
    * rows c, positives p)); walking scores ascending, a score-group's
    * average rank is `cum + (c+1)/2` (cum = rows strictly below), so
    * the positives' rank-sum DOUBLED is the all-integer
    * `S2 = Σ p·(2·cum + c + 1)` and
    * `AUC = (S2 − np·(np+1)) / (2·np·nn)` — integer aggregation end to
    * end, then ONE IEEE divide of exact operands: bit-identical on any
    * engine, any partitioning. Degenerate inputs (no positives or no
    * negatives) yield null.
    *
    * Scale shape: the only data-sized exchange is the score groupBy;
    * the cumulative window then runs over DISTINCT scores on one
    * partition — bounded by score cardinality, same contract as
    * [[binnedQuantiles]]'s cumulative (a well-behaved classifier emits
    * bounded-precision scores; quantize first if yours doesn't). */
  def binaryAuc(df: DataFrame, score: Column, label: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = df
      .select(score.cast(DoubleType).as("s"), label.cast("long").as("y"))
      .filter(col("s").isNotNull && col("y").isNotNull)
      .groupBy("s").agg(count(lit(1)).as("c"), sum("y").as("p"))
    val below = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val agg = g
      .withColumn("cum", coalesce(sum(col("c")).over(below), lit(0L)))
      .agg(
        sum(col("p")).as("n_pos"),
        (sum(col("c")) - sum(col("p"))).as("n_neg"),
        sum(col("p") * (lit(2L) * col("cum") + col("c") + lit(1L))).as("s2"))
    agg.select(col("n_pos"), col("n_neg"),
      when(col("n_pos") > 0 && col("n_neg") > 0,
        (col("s2") - col("n_pos") * (col("n_pos") + 1)).cast(DoubleType) /
          (lit(2L) * col("n_pos") * col("n_neg")).cast(DoubleType))
        .otherwise(lit(null).cast(DoubleType)).as("auc"))
  }

  /** Calibration (reliability) report for a [0, 1] classifier score —
    * [[binaryAuc]]'s companion: AUC says the RANKING is right,
    * calibration says the PROBABILITIES are. `bins` equal-width buckets
    * over [0, 1); per bucket: row count, positive count, the observed
    * positive rate (ONE IEEE divide of exact integers — bit-mirrorable)
    * and the bucket midpoint to plot it against (a constant, not a
    * float mean whose summation order would diverge cross-engine;
    * score 1.0 clamps into the top bucket). Empty buckets are absent —
    * callers outer-join a bin spine if they need the zero rows.
    * Scale shape: ONE bin-keyed map-side-combined exchange, at most
    * `bins` rows ever move. */
  def calibrationBins(df: DataFrame, score: Column, label: Column,
                      bins: Int = 10): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val b = least(floor(score.cast(DoubleType) * bins).cast("long"),
      lit(bins - 1L))
    df.select(b.as("bin"), label.cast("long").as("y"))
      .filter(col("bin").isNotNull && col("y").isNotNull)
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("y").as("n_pos"))
      .select(col("bin"),
        ((col("bin").cast(DoubleType) + 0.5) / bins).as("bin_mid"),
        col("n"), col("n_pos"),
        (col("n_pos").cast(DoubleType) / col("n").cast(DoubleType))
          .as("pos_rate"))
  }

  /** Snapshot diff — the crawl-to-crawl (or curation-run-to-run) delta
    * report every corpus-versioning workflow needs: per document id,
    * whether it was `added`, `removed`, `changed`, or `unchanged`
    * between two corpus versions, judged by an md5 content fingerprint
    * over `contentCols` (md5 of the columns joined on U+0001 — the
    * engine-wide oracle-mirrorable hash; null columns render as empty,
    * documented). Returns (id, status, side-coalesced content hash).
    *
    * Scale shape: each side reduces to (id, 32-char hash) AT THE SCAN —
    * content never survives past the projection — then ONE id-keyed
    * full-outer join; with both snapshots bucketed by id
    * ([[graft.sources.BucketedStore]]) even that exchange disappears.
    * Callers aggregate `groupBy(status)` for the report line, keep the
    * row form for the changed-id work-list, or anti-join `removed` into
    * a tombstone feed. No reference counterpart — extension surface. */
  def corpusDiff(prev: DataFrame, cur: DataFrame, idCol: String,
                 contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "corpusDiff needs >= 1 content column")
    // id keeps its source type (string/long/uuid all equate fine); a
    // cast here would silently null out non-numeric ids and misreport
    // every such doc as added+removed
    def keyed(df: DataFrame, h: String) = df.select(
      col(idCol).as("id"),
      md5(concat_ws("\u0001", contentCols.map(c =>
        coalesce(col(c).cast(StringType), lit(""))): _*)).as(h))
    keyed(prev, "h_prev").join(keyed(cur, "h_cur"), Seq("id"), "full_outer")
      .select(col("id"),
        when(col("h_prev").isNull, "added")
          .when(col("h_cur").isNull, "removed")
          .when(col("h_prev") === col("h_cur"), "unchanged")
          .otherwise("changed").as("status"),
        coalesce(col("h_cur"), col("h_prev")).as("content_hash"))
  }

  /** Token-distribution drift between two corpus slices — the
    * crawl-to-crawl / mix-rebalance monitor ("did this month's data
    * move?") behind distributionally-aware curation (DoReMi-style
    * domain reweighting reads exactly these divergences): per `group`,
    * the KL divergences (both directions) and the symmetric
    * Jensen–Shannon divergence between slice A (`aFilter`) and slice B
    * (the rest) over their whitespace-token unigram distributions,
    * add-half smoothed over the union vocabulary:
    *
    *   p_a(t) = (2·c_a(t)+1) / (2·N_a+V)   (and likewise p_b),
    *   kl_ab = Σ_t p_a ln(p_a/p_b),   js = ½KL(a‖m) + ½KL(b‖m),
    *   m = (p_a+p_b)/2.
    *
    * Cross-engine float contract: each per-token log-ratio quantizes
    * ONCE to integer micro-nats; the Σ is then an exact BIGINT sum of
    * `(2c+1)·x_micro` terms and every reported divergence is ONE
    * int→double division — bit-identical anywhere, no float
    * reassociation. (Bound: the micro-nat sum stays under 2⁶³ while
    * `(2N+V)·ln(2N+V)·10⁶` does — comfortable to ~10¹¹ tokens per
    * group; past that, drop the quantization to 10³ or widen to
    * DECIMAL.)
    *
    * Scale shape: token histograms for BOTH slices ride ONE
    * vocab-bounded map-side-combined exchange (conditional sums); the
    * group totals are a group-bounded broadcast; the divergence
    * aggregate consumes the histogram, nothing token-sized moves
    * twice. */
  def tokenDistributionDrift(df: DataFrame, textCol: String,
                             groupCol: String, aFilter: Column): DataFrame = {
    val tok = df.select(col(groupCol).as("g"), aFilter.as("__a"),
      explode(filter(split(trim(col(textCol)), "\\s+"), w => w =!= ""))
        .as("t"))
    val hist = tok.groupBy("g", "t")
      .agg(sum(when(col("__a"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("__a"), 0L).otherwise(1L)).as("cb"))
    val tot = hist.groupBy("g")
      .agg(sum("ca").as("na"), sum("cb").as("nb"),
        count(lit(1)).as("v"))
    val j = hist.join(broadcast(tot), Seq("g"))
    def micro(x: Column): Column = round(lit(1e6) * x, 0).cast("long")
    val pa = (col("ca") * 2 + 1).cast("double") /
      (col("na") * 2 + col("v")).cast("double")
    val pb = (col("cb") * 2 + 1).cast("double") /
      (col("nb") * 2 + col("v")).cast("double")
    val m = (pa + pb) / lit(2d)
    val terms = j.select(col("g"), col("na"), col("nb"), col("v"),
      ((col("ca") * 2 + 1) * micro(log(pa / pb))).as("tab"),
      ((col("cb") * 2 + 1) * micro(log(pb / pa))).as("tba"),
      ((col("ca") * 2 + 1) * micro(log(pa / m))).as("tam"),
      ((col("cb") * 2 + 1) * micro(log(pb / m))).as("tbm"))
    terms.groupBy("g", "na", "nb", "v")
      .agg(sum("tab").as("sab"), sum("tba").as("sba"),
        sum("tam").as("sam"), sum("tbm").as("sbm"))
      .select(col("g").as(groupCol),
        col("na").as("n_tokens_a"), col("nb").as("n_tokens_b"),
        col("v").as("vocab"),
        (col("sab").cast("double") /
          ((col("na") * 2 + col("v")) * 1000000L).cast("double"))
          .as("kl_ab"),
        (col("sba").cast("double") /
          ((col("nb") * 2 + col("v")) * 1000000L).cast("double"))
          .as("kl_ba"),
        (lit(0.5) * (col("sam").cast("double") /
            ((col("na") * 2 + col("v")) * 1000000L).cast("double")) +
          lit(0.5) * (col("sbm").cast("double") /
            ((col("nb") * 2 + col("v")) * 1000000L).cast("double")))
          .as("js"))
  }
}
