package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: images/audio/video ride through the engine
  * as opaque `BinaryType` payloads plus a typed metadata struct. The
  * actual codec work (JPEG decode, resampling, frame sampling) is
  * partition-local batch work behind [[decodeBatch]]; this container has
  * no media libraries, so the decoder is a clearly-marked deterministic
  * STUB — the Spark-side contract (schema, partitioning, batch iteration,
  * column signatures) is real and tested, and a production build swaps
  * only the stub body.
  */
object Multimodal {

  /** Canonical multimodal record schema. */
  val schema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("source", StringType, nullable = true),
      StructField("byte_len", LongType, nullable = true))), nullable = true)))

  /** Extracted-feature schema produced by [[decodeAndFeaturize]]. */
  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("content_hash", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  /** Build a multimodal frame from the documents table by treating the
    * UTF-8 text bytes as an opaque payload — the shape a real ingest
    * (parquet with a binary column) would have. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      lit("text").as("modality"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(col("source").as("source"),
        length(encode(col("text"), "UTF-8")).cast(LongType).as("byte_len")).as("meta"))

  /** STUB decoder — stands in for the real image/audio codec.
    * Deterministic: derives fake width/height from the payload's md5 so
    * results are stable and oracle-checkable. A real build replaces the
    * body with e.g. javax.imageio / ffmpeg bindings; the signature
    * (one batch of payloads in, one batch of features out) is the
    * production contract for partition-local, vectorized decode. */
  def decodeBatch(batch: Iterator[Row]): Iterator[Row] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    batch.map { r =>
      val id = r.getLong(0)
      val modality = r.getString(1)
      val payload = r.getAs[Array[Byte]](2)
      val digest = md.digest(payload) // md5 per asset; MessageDigest resets
      val hex = digest.map("%02x".format(_)).mkString
      // STUB: fake dimensions from the first hash bytes (real impl decodes)
      val width = java.lang.Integer.parseInt(hex.substring(0, 2), 16)
      val height = java.lang.Integer.parseInt(hex.substring(2, 4), 16)
      Row(id, modality, payload.length.toLong, hex, width, height)
    }
  }

  /** Partition-local decode + feature extraction over the multimodal
    * frame. `mapPartitions` keeps the codec call batched per partition
    * (no per-row JVM/native boundary crossings) and preserves the input
    * partitioning — no shuffle. */
  def decodeAndFeaturize(mm: DataFrame): DataFrame =
    mm.select(col("asset_id"), col("modality"), col("payload"))
      .mapPartitions(decodeBatch)(org.apache.spark.sql.Encoders.row(featureSchema))

  /** Pure-expression variant of the stub featurization (md5/length are
    * native codegen'd functions) — used for oracle checks and as the
    * fast path when features are expressible as columns. */
  def featurizeExpr(mm: DataFrame): DataFrame =
    mm.select(
      col("asset_id"),
      col("modality"),
      length(col("payload")).cast(LongType).as("byte_len"),
      md5(col("payload")).as("content_hash"),
      conv(substring(md5(col("payload")), 1, 2), 16, 10).cast(IntegerType).as("width"),
      conv(substring(md5(col("payload")), 3, 2), 16, 10).cast(IntegerType).as("height"))
}
