package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo, XxHash64, aggregate}

import graft.expressions.{AffineMinHash, ArrayCosine, ArrayL2Sq, BinarySlice, BpePreTokens, BpeTokenCount, BpeTokenIds, BpeTokens, CsvLineFields, ExactMedian, FixMojibake, ImageDims, KmvDistinct, KmvSketch, Md5PrefixHashArray, NfcNormalize, RobotsAllowed, RobotsCrawlDelay, RobotsSitemaps, ScriptCounts, SignBucket, SimHash32, SimHash60, SortedLongJaccard, SpTokenIds, SpTokens, StringNumClass, UnigramEncode, WordPieceIds, WordPieceTokens}

/** Registers graft's native Catalyst expressions with a SparkSession via
  * the public extensions mechanism:
  * `spark.sql.extensions=graft.GraftExtensions` (set by [[GraftSession]],
  * or pass `--conf` to any spark-submit/shell). Functions are then
  * callable from SQL and from the Column API through
  * `functions.call_function`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[ArrayCosine].getName, "graft_cosine"),
      (es: Seq[Expression]) => ArrayCosine(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("graft_l2sq"),
      new ExpressionInfo(classOf[ArrayL2Sq].getName, "graft_l2sq"),
      (es: Seq[Expression]) => ArrayL2Sq(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("graft_simhash32"),
      new ExpressionInfo(classOf[SimHash32].getName, "graft_simhash32"),
      (es: Seq[Expression]) => SimHash32(es.head)))
    ext.injectFunction((FunctionIdentifier("graft_simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, "graft_simhash60"),
      (es: Seq[Expression]) => SimHash60(es.head)))
    ext.injectFunction((FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[AffineMinHash].getName, "graft_minhash"),
      (es: Seq[Expression]) =>
        AffineMinHash(es.head, es(1).eval().asInstanceOf[Int])))
    ext.injectFunction((FunctionIdentifier("graft_jaccard_sorted"),
      new ExpressionInfo(classOf[SortedLongJaccard].getName, "graft_jaccard_sorted"),
      (es: Seq[Expression]) => SortedLongJaccard(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("graft_md5_hash_array"),
      new ExpressionInfo(classOf[Md5PrefixHashArray].getName, "graft_md5_hash_array"),
      (es: Seq[Expression]) =>
        Md5PrefixHashArray(es.head, es(1).eval().asInstanceOf[Int])))
    ext.injectFunction((FunctionIdentifier("graft_median"),
      new ExpressionInfo(classOf[ExactMedian].getName, "graft_median"),
      (es: Seq[Expression]) => ExactMedian(es.head)))
    ext.injectFunction((FunctionIdentifier("graft_kmv_distinct"),
      new ExpressionInfo(classOf[KmvDistinct].getName, "graft_kmv_distinct"),
      (es: Seq[Expression]) => KmvDistinct(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("graft_kmv_sketch"),
      new ExpressionInfo(classOf[KmvSketch].getName, "graft_kmv_sketch"),
      (es: Seq[Expression]) => KmvSketch(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("graft_numclass"),
      new ExpressionInfo(classOf[StringNumClass].getName, "graft_numclass"),
      (es: Seq[Expression]) => StringNumClass(es.head)))
    ext.injectFunction((FunctionIdentifier("graft_csv_fields"),
      new ExpressionInfo(classOf[CsvLineFields].getName, "graft_csv_fields"),
      (es: Seq[Expression]) => CsvLineFields(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("graft_binary_slice"),
      new ExpressionInfo(classOf[BinarySlice].getName, "graft_binary_slice"),
      (es: Seq[Expression]) => BinarySlice(es.head, es(1), es(2))))
    ext.injectFunction((FunctionIdentifier("graft_bpe_count"),
      new ExpressionInfo(classOf[BpeTokenCount].getName, "graft_bpe_count"),
      (es: Seq[Expression]) => BpeTokenCount(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("graft_bpe_tokens"),
      new ExpressionInfo(classOf[BpeTokens].getName, "graft_bpe_tokens"),
      (es: Seq[Expression]) => BpeTokens(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("graft_bpe_ids"),
      new ExpressionInfo(classOf[BpeTokenIds].getName, "graft_bpe_ids"),
      (es: Seq[Expression]) => BpeTokenIds(es.head, es(1), es(2))))
    ext.injectFunction((FunctionIdentifier("graft_bpe_pretokens"),
      new ExpressionInfo(classOf[BpePreTokens].getName, "graft_bpe_pretokens"),
      (es: Seq[Expression]) => BpePreTokens(es.head)))
    ext.injectFunction((FunctionIdentifier("graft_sp_tokens"),
      new ExpressionInfo(classOf[SpTokens].getName, "graft_sp_tokens"),
      (es: Seq[Expression]) => SpTokens(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("graft_sp_ids"),
      new ExpressionInfo(classOf[SpTokenIds].getName, "graft_sp_ids"),
      (es: Seq[Expression]) => SpTokenIds(es.head, es(1), es(2))))
    ext.injectFunction((FunctionIdentifier("graft_wp_tokens"),
      new ExpressionInfo(classOf[WordPieceTokens].getName, "graft_wp_tokens"),
      (es: Seq[Expression]) => WordPieceTokens(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("graft_wp_ids"),
      new ExpressionInfo(classOf[WordPieceIds].getName, "graft_wp_ids"),
      (es: Seq[Expression]) => WordPieceIds(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("graft_ug_encode"),
      new ExpressionInfo(classOf[UnigramEncode].getName, "graft_ug_encode"),
      (es: Seq[Expression]) => UnigramEncode(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("graft_robots_allowed"),
      new ExpressionInfo(classOf[RobotsAllowed].getName, "graft_robots_allowed"),
      (es: Seq[Expression]) => RobotsAllowed(es.head, es(1), es(2))))
    ext.injectFunction((FunctionIdentifier("graft_robots_crawl_delay"),
      new ExpressionInfo(classOf[RobotsCrawlDelay].getName, "graft_robots_crawl_delay"),
      (es: Seq[Expression]) => RobotsCrawlDelay(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("graft_robots_sitemaps"),
      new ExpressionInfo(classOf[RobotsSitemaps].getName, "graft_robots_sitemaps"),
      (es: Seq[Expression]) => RobotsSitemaps(es.head)))
    ext.injectFunction((FunctionIdentifier("graft_script_counts"),
      new ExpressionInfo(classOf[ScriptCounts].getName, "graft_script_counts"),
      (es: Seq[Expression]) => ScriptCounts(es.head)))
    ext.injectFunction((FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (es: Seq[Expression]) => NfcNormalize(es.head)))
    ext.injectFunction((FunctionIdentifier("graft_fix_mojibake"),
      new ExpressionInfo(classOf[FixMojibake].getName, "graft_fix_mojibake"),
      (es: Seq[Expression]) => FixMojibake(es.head)))
    ext.injectFunction((FunctionIdentifier("graft_image_dims"),
      new ExpressionInfo(classOf[ImageDims].getName, "graft_image_dims"),
      (es: Seq[Expression]) => ImageDims(es.head)))
    ext.injectFunction((FunctionIdentifier("graft_signbucket"),
      new ExpressionInfo(classOf[SignBucket].getName, "graft_signbucket"),
      (es: Seq[Expression]) =>
        SignBucket(es.head, es(1).eval().asInstanceOf[Int])))
    // Spark's own runtime-filter Bloom pair, surfaced as callable
    // functions: build(value, estimatedItems, numBits) -> binary bitset,
    // contains(bitset, value) -> boolean. Values are xxhash64-bridged so
    // any orderable key type works on both sides with identical hashing.
    ext.injectFunction((FunctionIdentifier("graft_bloom_build"),
      new ExpressionInfo(
        classOf[aggregate.BloomFilterAggregate].getName, "graft_bloom_build"),
      (es: Seq[Expression]) =>
        new aggregate.BloomFilterAggregate(XxHash64(Seq(es.head), 42L), es(1), es(2))))
    ext.injectFunction((FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(
        classOf[BloomFilterMightContain].getName, "graft_bloom_contains"),
      (es: Seq[Expression]) =>
        BloomFilterMightContain(es.head, XxHash64(Seq(es(1)), 42L))))
  }
}
