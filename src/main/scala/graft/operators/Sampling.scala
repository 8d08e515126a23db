package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.operators.TextAnalysis.hash60

/** Deterministic sampling and sharding for training-data pipelines.
  *
  * Everything here is keyed on a content/id hash, never on `rand()`:
  * the same row lands in the same sample/split on every run, on any
  * cluster layout, and in any engine (the hash is the md5-prefix
  * [[TextAnalysis.hash60]], reproducible in ANSI SQL for oracle
  * checks). That determinism is what makes train/validation splits
  * auditable and incremental reruns consistent — the standard practice
  * for corpus curation at scale.
  *
  * Scale posture: hash-filter sampling is a pure narrow map (pushes into
  * the scan, no shuffle); budget packing is one window pass partitioned
  * by the caller's shard key, so state per task is one running sum.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from a key column: md5-prefix hash of
    * (salt || key). Changing the salt draws an independent sample. */
  def hashBucket(key: Column, salt: String, buckets: Int): Column =
    hash60(concat(lit(salt), key.cast(StringType))) % buckets

  /** Deterministic `fraction`-sample: keeps rows whose hash bucket falls
    * below fraction × buckets. Unlike `df.sample`, membership is a pure
    * function of the key — stable across runs/partitionings, and the
    * filter is a scan-level predicate (no shuffle, no RNG state). */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
                 salt: String = "graft", buckets: Int = 1000000): DataFrame =
    df.filter(hashBucket(col(keyCol), salt, buckets) <
      math.round(fraction * buckets))

  /** Deterministic train/validation/test split: adds a `split` column
    * chosen by hash bucket against cumulative weight thresholds (weights
    * need not sum to 1; they are normalized). Every row gets exactly one
    * label; the same key always gets the same label. */
  def hashSplit(df: DataFrame, keyCol: String, weights: Seq[(String, Double)],
                salt: String = "graft", buckets: Int = 10000): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "weights must be positive")
    val total = weights.map(_._2).sum
    val thresholds = weights.scanLeft(0.0)(_ + _._2 / total).tail
      .map(f => math.round(f * buckets))
    val b = hashBucket(col(keyCol), salt, buckets)
    val labeled = weights.map(_._1).zip(thresholds).reverse
      .foldLeft(lit(weights.last._1)) { case (acc, (name, thr)) =>
        when(b < thr, name).otherwise(acc)
      }
    df.withColumn("split", labeled)
  }

  /** Token-budget sequence packing: assigns each row a contiguous `bin`
    * id such that bin i covers the rows whose EXCLUSIVE running token
    * total (in `orderCol` order within the `groupCols` shard) lies in
    * [i*budget, (i+1)*budget) — the streaming-concat binning used to
    * pack documents into fixed-size training sequences. One window pass;
    * the running sum is the only per-task state, and shards bound the
    * window partitions at corpus scale. */
  def packBudget(df: DataFrame, groupCols: Seq[String], orderCol: String,
                 tokensCol: Column, budget: Long): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("bin",
      floor(coalesce(sum(tokensCol).over(w), lit(0L)) / budget))
  }

  /** Fixed-length sequence packing — the concat-and-chunk step between
    * tokenized documents and training shards (the convention GPT-style
    * pretraining uses: concatenate every document's ids plus an `eosId`
    * separator in a deterministic order, then cut the stream into
    * consecutive `seqLen`-token sequences, dropping the final partial).
    * Returns one row per FULL sequence: the `groupCols`, `seq` (0-based
    * within its group) and `ids` (ARRAY&lt;INT&gt;, length exactly
    * `seqLen`) — the exact rows [[graft.sources.IndexedTokens
    * .writeIndexed]] shards for the trainer.
    *
    * Scale shape: the running-offset window partitions by `groupCols`
    * (same contract as [[packBudget]] — pick shard-sized groups, e.g. a
    * [[trainingOrder]] shard, so one group is one task's work); the
    * token-level exchange keyed (group, seq) IS the transformation —
    * each output sequence interleaves tokens from adjacent documents,
    * so that data movement is irreducible, and it is keyed by the
    * OUTPUT unit so it never re-shuffles downstream. Order inside a
    * sequence is reconstructed by position sort, not arrival order —
    * deterministic under any scheduling. */
  def packSequences(df: DataFrame, groupCols: Seq[String], orderCol: String,
                    idsCol: String, seqLen: Int, eosId: Int): DataFrame = {
    require(seqLen >= 2, s"seqLen must be >= 2, got $seqLen")
    require(groupCols.nonEmpty, "packSequences needs at least one group col")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(groupCols.map(col) :+ col(orderCol) :+
        concat(col(idsCol).cast("array<int>"), array(lit(eosId))).as("__ids"): _*)
      .withColumn("__start",
        coalesce(sum(size(col("__ids")).cast("long")).over(w), lit(0L)))
      .select(groupCols.map(col) :+ col("__start") :+
        posexplode(col("__ids")).as(Seq("__i", "__id")): _*)
      .select(groupCols.map(col) :+
        ((col("__start") + col("__i")) % seqLen).as("__off") :+
        floor((col("__start") + col("__i")) / seqLen).as("seq") :+
        col("__id"): _*)
      .groupBy(groupCols.map(col) :+ col("seq"): _*)
      .agg(sort_array(collect_list(struct(col("__off"), col("__id")))).as("__st"))
      .filter(size(col("__st")) === seqLen)
      .select(groupCols.map(col) :+ col("seq") :+
        transform(col("__st"), s => s("__id")).as("ids"): _*)
  }

  /** Deterministic mixture resampling: downsample each group so the
    * OUTPUT follows the target `weights` proportions exactly (in
    * expectation), keeping as much data as the scarcest group allows —
    * the "data mixing" stage that rebalances a crawl toward a training
    * distribution (e.g. 3 parts web : 1 part code : 1 part books).
    *
    * The per-group acceptance rate is `C·w_g / n_g` with
    * `C = min_g(n_g / w_g)`, so the binding group keeps 100% of its rows
    * and every other group is thinned to match; groups absent from
    * `weights` are dropped. Membership is the same hash predicate as
    * [[hashSample]] — a pure scan-level filter, stable across runs and
    * engines. The only coordination is one count-aggregate over the
    * grouping column (rows = number of groups, driver-sized by
    * construction — the same altitude as a ratio-base collect). */
  def mixtureSample(df: DataFrame, groupCol: String, keyCol: String,
                    weights: Map[String, Double], salt: String = "mix",
                    buckets: Int = 1000000): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    val counts = df.filter(col(groupCol).isin(weights.keys.toSeq: _*))
      .groupBy(groupCol).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = weights.filter { case (g, _) => counts.contains(g) }
    require(present.nonEmpty, "no weighted group present in the data")
    val cMin = present.map { case (g, w) => counts(g) / w }.min
    // group -> hash threshold; deterministic iteration (sorted) so the
    // generated plan is stable run-to-run
    val thr = present.toSeq.sortBy(_._1).map { case (g, w) =>
      g -> math.round(cMin * w / counts(g) * buckets)
    }
    val thrCol = thr.foldLeft(lit(-1L)) { case (acc, (g, t)) =>
      when(col(groupCol) === g, lit(t)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol), salt, buckets) < thrCol)
  }

  /** Deterministic UP-sampling — the other half of data mixing
    * ([[mixtureSample]] thins; this repeats): each group's rows are
    * emitted `rate_g` times in expectation, with `rate_g` the caller's
    * per-group repeat factor (the "epochs" of LLaMA/DoReMi-style
    * mixtures, e.g. books→3.2 epochs, web→1.0). A row emits
    * ⌊rate⌋ whole copies plus one more iff its key hash falls under
    * frac(rate) — the same md5 predicate as [[hashSample]], so
    * membership of the fractional epoch is a pure function of the key:
    * stable across runs, partitionings and engines, and each copy
    * carries its `epoch` index (0-based) so downstream shuffles
    * ([[trainingOrder]] salted with it) spread repeats apart.
    * `maxRepeat` caps any group's factor (the published mixtures cap
    * small-source epochs to bound memorization). Groups without a rate
    * pass through at 1.0. Pure scan-level explode — no shuffle, no
    * coordination; output size is Σ_g n_g·min(rate_g, maxRepeat)
    * in expectation, exactly. */
  def mixtureUpsample(df: DataFrame, groupCol: String, keyCol: String,
                      rates: Map[String, Double], maxRepeat: Double = 8.0,
                      salt: String = "epoch",
                      buckets: Int = 1000000): DataFrame = {
    // rates below 1 are thinning — that's mixtureSample's job, and a
    // fractional-only rate would make the sequence bound negative
    require(rates.values.forall(_ >= 1.0), "rates must be >= 1 (upsampling)")
    require(maxRepeat >= 1.0, s"maxRepeat must be >= 1, got $maxRepeat")
    val rate = rates.toSeq.sortBy(_._1)
      .foldLeft(lit(1.0)) { case (acc, (g, r)) =>
        when(col(groupCol) === g, lit(math.min(r, maxRepeat))).otherwise(acc)
      }
    val whole = floor(rate).cast("int")
    val fracThr = ((rate - floor(rate)) * buckets).cast("long")
    val extra = (hashBucket(col(keyCol), salt, buckets) < fracThr).cast("int")
    df.withColumn("epoch",
      explode(sequence(lit(0), whole + extra - 1)))
  }

  /** Temperature-weighted mixture MICRO-RATES from per-group sizes —
    * the published multi-source pretraining knob (GPT-3 §2.2, LLaMA
    * §2.1 weight sources by `n_i^alpha`, alpha < 1 flattening the mix
    * toward small sources): group weight w_i = n_i^alpha, group share
    * w_i / Σw, target draw T = totalFactor · Σn, per-row rate
    * r_i = share_i · T / n_i, capped at `maxRepeat`, quantized ONCE to
    * integer micro-units (floor(r·1e6) — everything downstream is
    * integer-exact).
    *
    * Cross-engine exactness contract: at alpha = 0.5 every float step
    * is a single correctly-rounded IEEE op (sqrt is exactly rounded by
    * spec; the weight fold runs in group-name-ascending order on both
    * sides), so an independent engine recomputes the identical r6 from
    * the same counts — the q133 oracle does. Other alphas use
    * `math.pow`, whose last-bit rounding is not guaranteed identical
    * across engines; fine for production, not for a hash-equality
    * oracle. */
  def temperatureRates6(counts: Seq[(String, Long)], alpha: Double,
                        totalFactor: Double, maxRepeat: Double): Seq[(String, Long)] = {
    require(counts.nonEmpty, "no groups to mix")
    require(counts.forall(_._2 > 0), "group sizes must be positive")
    require(alpha > 0 && totalFactor > 0 && maxRepeat > 0)
    val sorted = counts.sortBy(_._1)
    def w(n: Long): Double =
      if (alpha == 0.5) math.sqrt(n.toDouble) else math.pow(n.toDouble, alpha)
    val denom = sorted.foldLeft(0.0) { case (a, (_, n)) => a + w(n) }
    val t = totalFactor * sorted.foldLeft(0L)(_ + _._2).toDouble
    sorted.map { case (g, n) =>
      (g, math.floor(math.min(w(n) / denom * t / n.toDouble, maxRepeat) * 1e6).toLong)
    }
  }

  /** Temperature mixture over a corpus: per-group rates from
    * [[temperatureRates6]] (ONE tiny group-count aggregate runs eagerly
    * — the rate table is the model, group-cardinality-sized), then the
    * [[mixtureUpsample]] epoch mechanics driven by integer micro-rates:
    * every row emits `r6 div 1e6` whole epochs plus one more when its
    * hash bucket falls under `r6 mod 1e6` — so big sources thin
    * (rate < 1: most rows emit nothing) and small sources repeat, both
    * deterministic in the row key. Output adds `epoch`; rows drawn zero
    * times disappear. Scan-level after the count: the rate rides the
    * plan as a literal `when` chain, no join, no shuffle beyond the
    * one count aggregate. */
  def temperatureMixture(df: DataFrame, groupCol: String, keyCol: String,
                         alpha: Double = 0.5, totalFactor: Double = 1.0,
                         maxRepeat: Double = 8.0,
                         salt: String = "tmix"): DataFrame = {
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("__n"))
      .collect().map(r => (String.valueOf(r.get(0)), r.getLong(1))).toSeq
    require(counts.size <= 4096,
      s"${counts.size} groups won't inline as a rate table — pre-bucket")
    require(!counts.exists(_._1 == "null"),
      "null group values have no mixture weight — filter or fill first")
    val r6 = temperatureRates6(counts, alpha, totalFactor, maxRepeat)
      .foldLeft(lit(0L)) { case (acc, (g, r)) =>
        when(col(groupCol) === g, lit(r)).otherwise(acc)
      }
    // integer `div`, not Column./ (which is DOUBLE division) — the
    // whole/fractional split must stay bit-exact against the oracle
    val extra = (hashBucket(col(keyCol), salt, 1000000) < r6 % 1000000L)
      .cast("int")
    df.withColumn("__r6", r6)
      .withColumn("__c", expr("CAST(__r6 div 1000000 AS INT)") + extra)
      .filter(col("__c") >= 1) // sequence(0, -1) would DESCEND
      .withColumn("epoch", explode(sequence(lit(0), col("__c") - 1)))
      .drop("__r6", "__c")
  }

  /** Deterministic global training order: every row gets a `shard` and a
    * dense `pos` within its shard, both pure functions of the key hash —
    * the reproducible "global shuffle" that randomizes document order
    * before sequence packing, without RNG state or a single global sort.
    * Shard = hash mod `shards`; position = rank of the full 60-bit hash
    * within the shard (key as tiebreak, so the order is total). One
    * shuffle on the shard id; each shard sorts independently, so
    * parallelism = `shards` and no executor ever sees a global sort. */
  def trainingOrder(df: DataFrame, keyCol: String, salt: String = "ord",
                    shards: Int = 1024): DataFrame = {
    val h = hash60(concat(lit(salt), col(keyCol).cast(StringType)))
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(keyCol))
    df.withColumn("__h", h)
      .withColumn("shard", col("__h") % shards)
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__h")
  }

  /** Exact per-group quota sample: keep the `k` rows of each group with
    * the smallest key hashes (key as tiebreak) — the "500 docs per
    * language" eval-set builder. Unlike the rate-based [[mixtureSample]],
    * the output size per group is exactly min(k, group size), and
    * membership is stable under corpus growth ONLY for rows whose hash
    * stays within the k smallest (by design: a fixed-size reservoir must
    * evict). One shuffle on the group key; the per-group top-k is a rank
    * window that Spark pushes into WindowGroupLimit (top-k before full
    * materialization). */
  def quotaSample(df: DataFrame, groupCol: String, keyCol: String, k: Int,
                  salt: String = "quota"): DataFrame = {
    val h = hash60(concat(lit(salt), col(keyCol).cast(StringType)))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__h"), col(keyCol))
    df.withColumn("__h", h)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__h", "__rk")
  }

  /** Leakage-safe train/test split: near-duplicate documents always
    * land in the SAME split. A plain [[hashSplit]] on the document id
    * leaks — a near-dup pair straddling train/test lets the model see
    * (a paraphrase of) its eval data during training, the classic
    * contamination path that survives row-level dedup thresholds. Here
    * the split key is the document's near-dup CLUSTER representative
    * ([[Dedup.dedupClusters]]' connected-component root, rep = self for
    * unclustered docs), so every member of a cluster shares one split
    * assignment by construction. Adds `rep` and `split` to the input.
    *
    * Scale shape: the cluster pass is the banded-LSH + large/small-star
    * pipeline (never all-pairs); the split label itself is a pure
    * hash-of-rep expression; the only join this operator adds is
    * id-keyed cluster-to-corpus (co-partitioned with the cluster
    * output's own key). */
  def leakageSafeSplit(df: DataFrame, idCol: String, textCol: String,
                       threshold: Double, weights: Seq[(String, Double)],
                       salt: String = "graft"): DataFrame = {
    val cl = Dedup.dedupClusters(df, idCol, textCol, threshold)
      .select(col("id").as(idCol), col("rep"))
    hashSplit(df.join(cl, Seq(idCol)), "rep", weights, salt)
  }

  /** DSIR importance weights — the published hashed-ngram data-selection
    * method (Xie et al. 2023, "Data Selection for Language Models via
    * Importance Resampling"): fit bag-of-hashed-ngram categorical
    * distributions for a small TARGET corpus (the quality exemplar,
    * `targetFilter`) and the RAW pool (everything else), then score
    * every document by its log importance weight
    * `log w(x) = Σ_features [ln p_target(b) − ln p_raw(b)]` with
    * add-one smoothing over `buckets` hash buckets. Documents that
    * look more target-like than pool-like score positive; `kept`
    * thresholds at 0 (the deterministic stand-in for the paper's
    * Gumbel resampling — this engine never draws RNG).
    *
    * Features are unigrams + adjacent bigrams of the whitespace
    * tokenization, md5-bucketed ([[TextAnalysis.hash60]] mod buckets)
    * so the oracle recomputes them exactly. Cross-engine float
    * contract: the per-bucket log-ratio is quantized ONCE to integer
    * MICRO-NATS (`round(1e6·Δ, 0)` — an integer target both engines
    * round identically), so the per-document score is an
    * order-independent BIGINT sum, never a float reassociation.
    *
    * Scale shape: the bucket histogram is ONE map-side-combined
    * exchange bounded by `buckets` rows (both distributions ride the
    * same pass as conditional sums); totals are a lazy 1-row broadcast;
    * the bounded delta table broadcast-joins onto the feature stream at
    * the scan; the only data-sized exchange is the final doc-keyed
    * integer aggregate. Nothing token-sized is ever collected. */
  /** The DSIR feature stream of one text: unigram + adjacent-bigram
    * md5-bucket hashes of the whitespace tokenization. The token array
    * is let-BOUND ([[graft.functions.bound]]) — referencing the split
    * expression directly inside the bigram lambda would re-evaluate
    * the whole tokenization per element (higher-order lambdas get no
    * subexpression elimination), turning a linear scan into O(words²)
    * per document (measured 4× on sf0.1, 11× at 16× corpus). */
  private def dsirFeatures(text: Column, buckets: Int): Column = {
    val B = lit(buckets.toLong)
    graft.functions.bound(
      filter(split(trim(text), "\\s+"), w => w =!= "")) { ws =>
      val uni = transform(ws, w => pmod(hash60(w), B))
      val bi = when(size(ws) >= 2,
        transform(sequence(lit(0), size(ws) - 2),
          i => pmod(hash60(concat(element_at(ws, i + 1), lit(" "),
            element_at(ws, i + 2))), B)))
        .otherwise(array().cast("array<bigint>"))
      concat(uni, bi)
    }
  }

  /** The bounded per-bucket delta table `(b, d)` — integer micro-nat
    * `round(1e6·(ln p_target(b) − ln p_raw(b)))` with add-one
    * smoothing; numerators/denominators take ONE int→double cast each,
    * then one divide and one ln — the identical IEEE tree DuckDB
    * evaluates. */
  private def dsirDelta(df: DataFrame, textCol: String,
                        targetFilter: Column, buckets: Int): DataFrame = {
    val B = lit(buckets.toLong)
    val hist = df.select(targetFilter.as("__t"),
        explode(dsirFeatures(col(textCol), buckets)).as("b"))
      .groupBy("b")
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("ct"),
        sum(when(col("__t"), 0L).otherwise(1L)).as("cr"))
    val totals = hist.agg(sum("ct").as("nt"), sum("cr").as("nr"))
    hist.crossJoin(broadcast(totals)).select(col("b"),
      round(lit(1e6) *
          (log((col("ct") + lit(1L)).cast("double") /
               (col("nt") + B).cast("double")) -
           log((col("cr") + lit(1L)).cast("double") /
               (col("nr") + B).cast("double"))), 0)
        .cast("long").as("d"))
  }

  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
                  targetFilter: Column, buckets: Int = 4096): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 16),
      s"buckets must be in [2, 65536], got $buckets")
    val base = df.select(col(idCol).cast("long").as("doc_id"),
      targetFilter.as("__t"),
      dsirFeatures(col(textCol), buckets).as("__f"))
    val delta = dsirDelta(df, textCol, targetFilter, buckets)
    val perDoc = base.select(col("doc_id"), explode(col("__f")).as("b"))
      .join(broadcast(delta), Seq("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"), sum(col("d")).as("logw_micro"))
    base.select(col("doc_id"), col("__t").as("is_target"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("is_target"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("logw_micro"), lit(0L)).as("logw_micro"),
        (coalesce(col("logw_micro"), lit(0L)) > 0).as("kept"))
  }

  /** FREEZE the trained DSIR model as a dense bucket→delta vector (the
    * online-scoring handoff): deltas for every trained bucket come off
    * the SAME plan [[dsirWeights]] scores with (collected — bounded by
    * `buckets` rows, the model-sized-collect posture); buckets never
    * seen in training get the add-one default `ln((Nr+B)/(Nt+B))`, so
    * a stream carrying novel tokens still scores totally. */
  def dsirDeltasDense(df: DataFrame, textCol: String, targetFilter: Column,
                      buckets: Int = 4096): Array[Long] = {
    require(buckets >= 2 && buckets <= (1 << 16),
      s"buckets must be in [2, 65536], got $buckets")
    val rows = dsirDelta(df, textCol, targetFilter, buckets).collect()
    val totals = df.select(targetFilter.as("__t"),
        explode(dsirFeatures(col(textCol), buckets)).as("b"))
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("nt"),
        sum(when(col("__t"), 0L).otherwise(1L)).as("nr"))
      .collect()(0)
    val default = Math.round(1e6 *
      (math.log(1.0 / (totals.getLong(0) + buckets.toDouble)) -
       math.log(1.0 / (totals.getLong(1) + buckets.toDouble))))
    val out = Array.fill(buckets)(default)
    rows.foreach(r => out(r.getLong(0).toInt) = r.getLong(1))
    out
  }

  /** Score ONE text under a frozen delta vector — a pure expression
    * (stateless, whole-stage codegen, stream-safe): the same feature
    * stream folded over `element_at` lookups into the literal array.
    * Row-for-row equal to [[dsirWeights]]' `logw_micro` on any corpus
    * whose features were all seen at training. */
  def dsirScoreWith(text: Column, deltas: Seq[Long]): Column =
    aggregate(dsirFeatures(text, deltas.length),
      lit(0L),
      (acc, h) => acc + element_at(array(deltas.map(lit): _*),
        (h + lit(1L)).cast("int")))
}
