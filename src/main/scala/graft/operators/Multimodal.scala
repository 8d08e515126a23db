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

  /** Frame sampling (the video path): emit up to `nFrames` equal-stride
    * byte ranges per asset — the partitioning/shape contract of a real
    * ffmpeg keyframe sampler (one input row fans out to N frame rows,
    * narrow, no shuffle; downstream dedup/embedding operators consume
    * frames exactly like documents). The frame payload is the real byte
    * slice (Spark substring is binary-safe); `frame_hash` is the md5 of
    * the slice's lowercase hex so an engine without blob slicing (the
    * DuckDB oracle) can mirror it exactly. A production build swaps the
    * stride slicing for codec-aware keyframe offsets; everything else —
    * schema, explode shape, hash contract — stays.
    *
    * Frames are byte ranges [i*stride, i*stride+stride) for
    * stride = ceil(byte_len / nFrames); short/empty payloads produce
    * fewer (or zero) frames, never empty slices. */
  def sampleFrames(mm: DataFrame, nFrames: Int): DataFrame = {
    require(nFrames > 0)
    val len = length(col("payload")).cast(LongType)
    val stride = ceil(len.cast(DoubleType) / nFrames).cast(LongType)
    val nf = when(len === 0, 0L)
      .otherwise(ceil(len.cast(DoubleType) / stride.cast(DoubleType)).cast(LongType))
    // Slice the BINARY payload per frame, then hash the slice. What the
    // slice rewrite buys: the earlier formulation projected
    // lower(hex(payload)) — a 2x-payload string copy — through every
    // exploded row (~3nv bytes materialized for an n-frame, v-byte
    // video); now only the payload itself flows through the (pipelined,
    // codegen-fused) Generate until the final projection drops it — no
    // extra copy materializes. md5 of the slice's lowercase hex is
    // unchanged by the rewrite — byte boundaries align with 2-hex-char
    // boundaries — so the DuckDB oracle keeps its hex-substring mirror.
    // Offsets go through the native long-offset BinarySlice, not Spark's
    // Int-typed Substring, whose narrowing cast would silently WRAP an
    // offset past 2^31 to a negative position (mis-addressed bytes, not
    // an error) — stride x index arithmetic on chunked payloads can
    // address past 2 GiB even though one JVM byte[] caps at Int.MaxValue.
    val slice = call_function("graft_binary_slice",
      col("payload"), col("frame_idx") * col("__stride"), col("__stride"))
    mm.select(col("asset_id"), col("modality"), col("payload"),
        stride.as("__stride"), nf.as("__nf"))
      .filter(col("__nf") > 0)
      .select(col("asset_id"), col("modality"), col("payload"),
        col("__stride"),
        posexplode(sequence(lit(0L), col("__nf") - 1)).as(Seq("__p", "frame_idx")))
      .select(
        col("asset_id"),
        col("frame_idx").cast(IntegerType).as("frame_idx"),
        (col("frame_idx") * col("__stride")).as("frame_off"),
        length(slice).cast(LongType).as("frame_bytes"),
        md5(lower(hex(slice))).as("frame_hash"))
  }

  /** Resize (the image path): aspect-fit each asset's (stub-decoded)
    * dimensions into a `targetW`x`targetH` box and bind a deterministic
    * output-content hash to (content, target box) — the schema/contract
    * of a real resampler, with the pixel work behind the same stub seam
    * as [[decodeBatch]]. Scale factor min(tw/w, th/h) capped at 1 (never
    * upscale), output dims floored but >= 1. */
  def resizeStub(mm: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    require(targetW > 0 && targetH > 0)
    val feat = featurizeExpr(mm)
    // stub dims can be 0 (hash byte 0x00); a real decoder never emits a
    // zero dimension, and ANSI division would throw — clamp to >= 1
    val w = greatest(col("width"), lit(1)).cast(DoubleType)
    val h = greatest(col("height"), lit(1)).cast(DoubleType)
    val scale = least(lit(targetW) / w, lit(targetH) / h, lit(1.0))
    feat.select(
      col("asset_id"), col("modality"),
      greatest(col("width"), lit(1)).as("width"),
      greatest(col("height"), lit(1)).as("height"),
      lit(targetW).as("target_w"), lit(targetH).as("target_h"),
      greatest(floor(w * scale), lit(1L)).cast(IntegerType).as("out_w"),
      greatest(floor(h * scale), lit(1L)).cast(IntegerType).as("out_h"),
      // concat (not concat_ws): a null content_hash must yield a null
      // resized_hash — concat_ws would SKIP the null and fabricate a
      // real-looking hash bound to no content for a contentless asset
      md5(concat(col("content_hash"), lit(s"x${targetW}x$targetH")))
        .as("resized_hash"))
  }

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
