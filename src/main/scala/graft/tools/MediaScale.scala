package graft.tools

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

import graft.operators.Multimodal
import graft.expressions.{GifCodec, JpegCodec, PngCodec, WavCodec}

/** Scale-growth smoke for the multimodal CODEC paths (PNG / JPEG / GIF /
  * WAV / magic-byte sniff). Two independent axes, matching how a real
  * multimodal corpus grows:
  *
  *  1. ROW growth — the documents corpus replicated N×, tiny fixture
  *     payloads (the q86–q89/q91 shapes). Every decode operator is
  *     partition-local (`mapPartitions`, zero exchanges — plan-pinned in
  *     PlanAuditSpec), so wall MUST grow ~linearly in N with constant
  *     per-row cost; any super-linear bend would mean the path picked up
  *     a shuffle or driver-side state.
  *  2. PAYLOAD growth — fixed 2048 assets with production-sized payloads
  *     (hundreds of kB each), reporting decode MB/s. This is the number
  *     that decides whether the decode path can keep up with scan
  *     bandwidth on a 100 TB mixed-media corpus: bytes/s per core ×
  *     cores is the cluster's decode ceiling.
  *
  * Payloads are materialized (persist + count/sum forced) BEFORE the
  * timed leg, so the timings below are decode-only — the synthetic
  * encode that builds the fixture is excluded.
  *
  * Usage: scripts/run.sh graft.tools.MediaScale [sfDir] [mults...]
  */
object MediaScale {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mults = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 16, 64)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    /** Materialize the asset frame and return (df, rows, payloadBytes) —
      * forcing the persist so the decode leg below times decode only. */
    def pin(assets: DataFrame): (DataFrame, Long, Long) = {
      val a = assets.persist(StorageLevel.MEMORY_AND_DISK)
      val r = a.agg(count(lit(1)), coalesce(sum(length(col("payload"))), lit(0L)))
        .head()
      (a, r.getLong(0), r.getLong(1))
    }

    /** Time a decode leg; `okCol` counts successful decodes (non-null),
      * `decBytes` is the per-output-row DECODED byte count (raster /
      * PCM bytes actually produced — the honest throughput denominator
      * when the compressed payload is 100× smaller than what the codec
      * emits). Computed inside the timed aggregate so it adds no pass. */
    def leg(label: String, assets: DataFrame, okCol: String,
            decBytes: org.apache.spark.sql.Column)
           (decode: DataFrame => DataFrame): Unit = {
      val (a, n, bytes) = pin(assets)
      val t0 = System.nanoTime()
      val out = decode(a)
        .agg(count(lit(1)), count(col(okCol)),
          coalesce(sum(decBytes.cast(LongType)), lit(0L)))
        .head()
      val s = (System.nanoTime() - t0) / 1e9
      val mb = bytes / 1e6
      val decMb = out.getLong(2) / 1e6
      println(f"  $label%-14s ${s}%7.2fs  assets=$n%-8d out=${out.getLong(0)}%-8d " +
        f"ok=${out.getLong(1)}%-8d payload=${mb}%8.1f MB (${mb / s}%6.1f MB/s)  " +
        f"decoded=${decMb}%8.1f MB (${decMb / s}%7.1f MB/s)")
      require(out.getLong(1) == out.getLong(0),
        s"$label: ${out.getLong(0) - out.getLong(1)} payloads failed to decode")
      a.unpersist()
    }

    // MEDIA_SCALE_ONLY=rows|payload reruns one axis (dev aid)
    val only = sys.env.get("MEDIA_SCALE_ONLY")

    // ---- axis 1: row growth, fixture-sized payloads --------------------
    if (only.forall(_ == "rows"))
    {
    println("== row growth (fixture payloads, corpus replicated Nx) ==")
    for (n <- mults) {
      val ids = docs.withColumn("rep", explode(sequence(lit(0), lit(n - 1))))
        .select((col("doc_id") * n + col("rep")).as("doc_id"), col("text"))
      println(s"mult=$n")
      leg("pngResample", Multimodal.syntheticPixelAssets(ids), "out_hash",
        col("width") * col("height"))(Multimodal.resamplePixels(_, 8, 6))
      leg("jpegPixels", Multimodal.syntheticJpegAssets(ids), "pix_hash",
        col("width") * col("height") * col("channels"))(
        Multimodal.decodePixels(_))
      leg("gifFrames", Multimodal.syntheticGifAssets(ids), "frame_hash",
        col("width") * col("height") * lit(3))(Multimodal.decodeFrames(_, 2))
      leg("wavFeatures", Multimodal.syntheticAudioAssets(ids), "sum_sq",
        col("n_samples") * col("channels") * lit(2))(Multimodal.audioFeatures(_))
      leg("sniffRoute", Multimodal.syntheticMixedAssets(ids), "sniffed",
        lit(0L))(
        _.select(col("asset_id"),
          Multimodal.sniffModality(col("payload")).as("sniffed")))
    }
    }

    // ---- axis 2: payload growth, production-sized assets ---------------
    if (only.forall(_ == "payload"))
    {
    // Grayscale-identity GIF palette; block mosaics for JPEG so the lossy
    // path still decodes (we measure wall, not exactness, here — the
    // exactness contract is q86–q89's oracle job).
    println("== payload growth (2048 assets, production-sized payloads) ==")
    val big = spark.range(2048).select(col("id").as("doc_id"))
    val mmSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("modality", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))

    def gen(modality: String)(build: Long => Array[Byte]): DataFrame =
      big.mapPartitions { it =>
        it.map(r => Row(r.getLong(0), modality, build(r.getLong(0))))
      }(org.apache.spark.sql.Encoders.row(mmSchema))

    val bigPng = gen("image/png") { id =>
      val w = 640; val h = 480
      val px = Array.tabulate(w * h)(i => ((id * 31 + i) % 256).toByte)
      PngCodec.encode(PngCodec.Raster(w, h, 1, px), (id % 5).toInt)
    }
    leg("pngResample", bigPng, "out_hash",
      col("width") * col("height"))(Multimodal.resamplePixels(_, 64, 48))

    val bigJpeg = gen("image/jpeg") { id =>
      val w = 512; val h = 384
      val bw = (w + 7) / 8
      val px = Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        ((id * 29 + (y / 8) * bw + (x / 8)) % 256).toByte
      }
      JpegCodec.encode(PngCodec.Raster(w, h, 1, px),
        q = 0, restartInterval = (id % 3).toInt * 2)
    }
    leg("jpegPixels", bigJpeg, "pix_hash",
      col("width") * col("height") * col("channels"))(Multimodal.decodePixels(_))

    val bigGif = gen("image/gif") { id =>
      val w = 128; val h = 128
      val palette = Array.tabulate(768)(i => (i / 3).toByte)
      val frames = (0 until 8).map { f =>
        (4, Array.tabulate(w * h)(i => ((id * 17 + f * 53 + i) % 256).toByte))
      }
      GifCodec.encode(w, h, palette, frames)
    }
    leg("gifFrames", bigGif, "frame_hash",
      col("width") * col("height") * lit(3))(Multimodal.decodeFrames(_, 2))

    val bigWav = gen("audio/wav") { id =>
      val n = 16000 * 5 * 2 // 5 s stereo @ 16 kHz, interleaved
      val samples = Array.tabulate(n)(i => ((id * 7 + i * 13) % 4096 - 2048).toShort)
      WavCodec.encode(WavCodec.Clip(16000, 2, samples))
    }
    leg("wavFeatures", bigWav, "sum_sq",
      col("n_samples") * col("channels") * lit(2))(Multimodal.audioFeatures(_))
    }

    spark.stop()
  }
}
