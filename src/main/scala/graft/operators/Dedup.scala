package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.functions.cosine
import graft.operators.TextAnalysis.{fingerprint, hash32, hash60, wordShingles}

/** Deduplication operators for large-scale document corpora: exact
  * (hash-groupBy), MinHash+LSH banding, SimHash, exact n-gram Jaccard,
  * and embedding-cosine near-dup.
  *
  * Scale posture: nothing here materializes an O(n²) cross join. Candidate
  * generation is always an equi-join on a hash key (fingerprint, LSH band,
  * SimHash prefix) so Spark executes it as a shuffled hash join whose cost
  * is bounded by real collision groups; exact verification (Jaccard /
  * cosine) runs only on candidates. All hash primitives are md5-derived
  * and deterministic — identical results on every run and on any cluster
  * layout, and reproducible in ANSI SQL for oracle checks.
  */
object Dedup {

  /** Exact dedup: keep the first row (min of `keepBy`) per key group. */
  def exact(df: DataFrame, keys: Seq[String], keepBy: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(keepBy))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Per-group duplicate stats on the canonical fingerprint: one row per
    * fingerprint with its cardinality and representative id. */
  def fingerprintGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(fingerprint(col(textCol)).as("fp"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("rep_id"))

  /** MinHash signature from a bound shingle array: each shingle is md5-
    * hashed ONCE (the expensive step), then the k independent hash
    * functions are affine transforms (a_j*h + b_j) mod p over the base
    * hash — the standard universal-hashing construction. 32-bit base hash
    * and 31-bit modulus keep every product within 2^63 so the arithmetic
    * is exact (and overflow-free) in any engine. `sh` must be a
    * lambda-bound value (see [[graft.functions.bound]]) or a materialized
    * column, or the shingle computation is re-inlined per seed. */
  def minhashSignatureOf(sh: Column, k: Int): Column =
    call_function("graft_minhash",
      call_function("graft_md5_hash_array", sh, lit(8)), lit(k))

  /** MinHash signature straight from text (evaluates shingles once). */
  def minhashSignature(text: Column, k: Int, shingleN: Int = 3): Column =
    graft.functions.bound(wordShingles(text, shingleN))(sh => minhashSignatureOf(sh, k))

  /** LSH band keys from a bound signature: split the k-length signature
    * into `bands` rows-per-band groups; each band key is the md5-hash of
    * the joined slice, tagged with its band index so different bands never
    * collide. */
  def lshBandKeysOf(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      struct(b.as("band"),
        hash60(concat_ws(",",
          transform(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)), _.cast("string"))))
          .as("bkey")))

  /** MinHash-LSH candidate pairs: documents sharing >= 1 band bucket.
    * Returns distinct (id_a, id_b) with id_a < id_b plus the exact
    * shingle-Jaccard for verification. The join is an equi-join on
    * (band, bkey) — the classic LSH bucket join that scales as the sum of
    * bucket sizes squared, not corpus². Shingles and signature are
    * let-bound so the md5 work runs exactly once per document. */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 12, bands: Int = 4): DataFrame = {
    val rowsPerBand = k / bands
    val bandsExpr = graft.functions.bound(wordShingles(col(textCol), 3)) { sh =>
      graft.functions.bound(minhashSignatureOf(sh, k)) { sig =>
        lshBandKeysOf(sig, bands, rowsPerBand)
      }
    }
    // spread the shingle+hash work across all cores (a single input file
    // arrives as one split), then land the exploded band rows on their
    // bucket partitioning — the self-join reads BOTH sides from that one
    // exchange instead of recomputing the hash pipeline twice
    val par = df.sparkSession.sparkContext.defaultParallelism
    // hashed shingle sets for the verify-jaccard: long-array intersection
    // is far cheaper than string-array intersection and, since both sides
    // hash identically, yields the same Jaccard value
    val sig = df.repartition(par).select(
      col(idCol).as("id"),
      array_sort(array_distinct(
        call_function("graft_md5_hash_array", wordShingles(col(textCol), 3), lit(15)))).as("sh"),
      explode(bandsExpr).as("bk"))
      .repartition(col("bk"))
    val a = sig.select(col("id").as("id_a"), col("sh").as("sh_a"), col("bk"))
    val b = sig.select(col("id").as("id_b"), col("sh").as("sh_b"), col("bk"))
    a.join(b, Seq("bk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        jaccardSorted(col("sh_a"), col("sh_b")).as("jaccard"))
      .distinct()
  }

  /** Exact Jaccard similarity of two array columns (distinct-element
    * semantics). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast(DoubleType)
    val uni = size(array_union(a, b)).cast(DoubleType)
    round(when(uni === 0, 0.0).otherwise(inter / uni), 6)
  }

  /** Jaccard over sorted distinct long arrays — same value as [[jaccard]],
    * via the native merge-sweep [[graft.expressions.SortedLongJaccard]]. */
  def jaccardSorted(a: Column, b: Column): Column =
    round(call_function("graft_jaccard_sorted", a, b), 6)

  /** SimHash (32-bit): per bit, sum +1/-1 over token-hash bits; bit set if
    * the sum is >= 0. Dispatches to the native one-pass
    * [[graft.expressions.SimHash32]]; the value is identical to the pure
    * shift/mod column formulation (and its ANSI-SQL mirror). */
  def simhash(text: Column): Column =
    call_function("graft_simhash32", TextAnalysis.tokens(text))

  /** Hamming distance between two simhash values. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast(LongType)

  /** SimHash near-dup pairs within a blocking key: pairs with Hamming
    * distance <= maxHamming. Input spread across cores, block-partitioned
    * once so the self-join reuses a single exchange. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   blockCol: String, maxHamming: Int): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    val d = df.repartition(par)
      .select(col(blockCol).as("blk"), col(idCol).as("id"),
        simhash(col(textCol)).as("sh"))
      .repartition(col("blk"))
    val a = d.select(col("blk"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = d.select(col("blk"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("blk")).filter(col("id_a") < col("id_b"))
      .withColumn("hamming", hamming(col("sh_a"), col("sh_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("blk"), col("id_a"), col("id_b"), col("hamming"))
  }

  /** N-gram Jaccard near-dup pairs within a blocking key (e.g. source):
    * exact Jaccard >= threshold. Blocked equi-join, then verify. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        blockCol: String, n: Int, threshold: Double): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    val sh = df.repartition(par)
      .select(col(blockCol).as("blk"), col(idCol).as("id"),
        array_sort(array_distinct(
          call_function("graft_md5_hash_array", wordShingles(col(textCol), n), lit(15)))).as("sh"))
      .repartition(col("blk"))
    val a = sh.select(col("blk"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("blk"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", jaccardSorted(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("blk", "id_a", "id_b", "jaccard")
  }

  /** Embedding-cosine near-dup pairs above `threshold`.
    *
    * With `block` set (e.g. [[Similarity.signBucket]]) the pair space is
    * an equi-join on the bucket key — the scale path: cost is the sum of
    * bucket sizes squared. With `block` = None it is an exact full
    * pairwise check via broadcast nested-loop (one side broadcast, the
    * other streamed with full partition parallelism) — never join on a
    * constant key, which collapses to a single shuffle partition. Exact
    * mode is for corpora whose one side fits in a broadcast. */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
                        threshold: Double, block: Option[Column] = None): DataFrame = {
    val pairs = block match {
      case Some(bcol) =>
        val keyed = df.select(bcol.as("blk"), col(idCol).as("id_a"), col(vecCol).as("v_a"))
        val other = df.select(bcol.as("blk"), col(idCol).as("id_b"), col(vecCol).as("v_b"))
        keyed.join(other, Seq("blk")).drop("blk")
      case None =>
        // repartition the streamed side: a small single-file corpus would
        // otherwise run the whole O(n²) loop in one task
        val a = df.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
          .repartition(df.sparkSession.sparkContext.defaultParallelism)
        val b = df.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
        a.crossJoin(broadcast(b))
    }
    pairs
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(cosine(col("v_a"), col("v_b")), 6))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
