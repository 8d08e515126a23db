package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.{bound, cosine, cosineHof}

/** Native Catalyst expressions must be bit-identical to their reference
  * higher-order-function formulations (same fold order), and the
  * mapPartitions multimodal path must match the pure-expression path. */
class NativeExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val emb = graft.Tables(spark, TestSpark.sfDir, "embeddings")
  private lazy val docs = graft.Tables(spark, TestSpark.sfDir, "documents")

  test("ArrayCosine == HOF cosine, bit-identical") {
    val pairs = emb.limit(30).select(col("vec_id"), col("embedding").as("a"))
      .crossJoin(emb.limit(30).select(col("embedding").as("b")))
    val diff = pairs.select(
      (cosine(col("a"), col("b")) =!= cosineHof(col("a"), col("b"))).as("d"))
      .filter(col("d")).count()
    assert(diff == 0)
  }

  test("ArrayL2Sq == HOF squared distance, bit-identical") {
    import org.apache.spark.sql.types.DoubleType
    def l2Hof(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(
        zip_with(a, b, (x, y) =>
          (x.cast(DoubleType) - y.cast(DoubleType)) *
            (x.cast(DoubleType) - y.cast(DoubleType))),
        lit(0.0), (acc, x) => acc + x)
    val pairs = emb.limit(30).select(col("vec_id"), col("embedding").as("a"))
      .crossJoin(emb.limit(30).select(col("embedding").as("b")))
    val diff = pairs.select(
      (graft.functions.l2sq(col("a"), col("b")) =!= l2Hof(col("a"), col("b"))).as("d"))
      .filter(col("d")).count()
    assert(diff == 0)
  }

  test("SignBucket == HOF signBucket") {
    val diff = emb.select(
      (Similarity.signBucket(col("embedding"), 8) =!=
        Similarity.signBucketHof(col("embedding"), 8)).as("d"))
      .filter(col("d")).count()
    assert(diff == 0)
  }

  test("SimHash32 == shift/mod column formulation") {
    val hs = transform(TextAnalysis.tokens(col("text")), t => TextAnalysis.hash32(t))
    val colFormulation = bound(hs) { hsB =>
      (0 until 32).map { b =>
        val votes = aggregate(hsB, lit(0L),
          (acc, h) => acc + when(shiftright(h, b) % 2 === 1, 1L).otherwise(-1L))
        when(votes >= 0, lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
    val diff = docs.limit(50)
      .select((Dedup.simhash(col("text")) =!= colFormulation).as("d"))
      .filter(col("d")).count()
    assert(diff == 0)
  }

  test("SimHash60 == shift/mod column formulation over hash60") {
    val hs = transform(TextAnalysis.tokens(col("text")), t => TextAnalysis.hash60(t))
    val colFormulation = bound(hs) { hsB =>
      (0 until 60).map { b =>
        val votes = aggregate(hsB, lit(0L),
          (acc, h) => acc + when(shiftright(h, b) % 2 === 1, 1L).otherwise(-1L))
        when(votes >= 0, lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
    val diff = docs.limit(20)
      .select((Dedup.simhash60(col("text")) =!= colFormulation).as("d"))
      .filter(col("d")).count()
    assert(diff == 0)
  }

  test("AffineMinHash == column affine formulation") {
    val sh = TextAnalysis.wordShingles(col("text"), 3)
    val colSig = bound(transform(sh, s => TextAnalysis.hash32(s))) { hs =>
      transform(sequence(lit(0), lit(11)), j =>
        array_min(transform(hs, h => ((j * 2 + 1) * h + (j * 7919 + 104729)) % 2147483647L)))
    }
    val diff = docs.limit(50)
      .select((Dedup.minhashSignature(col("text"), 12) =!= colSig).as("d"))
      .filter(col("d")).count()
    assert(diff == 0)
  }

  test("SortedLongJaccard == array_intersect/union jaccard") {
    val sh = array_sort(array_distinct(transform(
      TextAnalysis.wordShingles(col("text"), 3), s => TextAnalysis.hash60(s))))
    val d = docs.limit(30).select(col("doc_id"), sh.as("sh"))
    val pairs = d.select(col("sh").as("a"))
      .crossJoin(d.select(col("sh").as("b")))
    val diff = pairs.select(
      (Dedup.jaccardSorted(col("a"), col("b")) =!= Dedup.jaccard(col("a"), col("b"))).as("d"))
      .filter(col("d")).count()
    assert(diff == 0)
  }

  test("StringNumClass == try_cast(double)/integral-regex classification") {
    import org.apache.spark.sql.types.DoubleType
    import spark.implicits._
    val vals = Seq(
      "5", "+5", "-5", " 42 ", "007", "5.", "5.0", ".5", "1e3", "1E-3",
      "1.5f", "2d", "0x1.8p1", "inf", "Inf", "INFINITY", "-infinity",
      "nan", "NaN", "+inf",
      "", " ", "+", "-", ".", "N", "O", "abc", "12ab3", "1.2.3", "5€",
      "e3", "--5", "5-", "½", "Infinityy", "in", "\t9\t", "9 9",
      // boundaries of the pure-byte double scanner (strict parseDouble
      // subset): dangling/signed-empty exponents, sign-dot forms, dot
      // before exponent
      "1e", "1e+", "1e-", "+.5", "-.5e2", "5.e3", "+.", "-.e3")
    val df = vals.toDF("s")
    // reference formulation: Spark's own cast for double-castability, the
    // integral regex (with parseDouble's trim) for integral
    val ref = when(trim(col("s"), " \t\n\r\u000B\f").rlike("^[+-]?[0-9]+$"), 1)
      .otherwise(when(col("s").try_cast(DoubleType).isNotNull, 2).otherwise(3))
    val bad = df.select(col("s"), call_function("graft_numclass", col("s")).as("got"), ref.as("want"))
      .filter(col("got") =!= col("want")).collect()
    assert(bad.isEmpty, bad.mkString(", "))
  }

  test("topNgramCount fold == explode/group-count formulation") {
    val viaFold = docs.limit(200).select(col("doc_id"),
      TextAnalysis.topNgramCount(col("text"), 1).as("top1"),
      TextAnalysis.topNgramCount(col("text"), 3).as("top3"))
    def viaGroup(n: Int) = docs.limit(200)
      .select(col("doc_id"), explode(call_function("graft_md5_hash_array",
        TextAnalysis.wordShinglesAll(col("text"), n), lit(15))).as("h"))
      .groupBy("doc_id", "h").count()
      .groupBy("doc_id").agg(max("count").as(s"top$n"))
    val expected = docs.limit(200).select(col("doc_id"))
      .join(viaGroup(1), Seq("doc_id"), "left")
      .join(viaGroup(3), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("top1"), lit(0L)).as("top1"),
        coalesce(col("top3"), lit(0L)).as("top3"))
    assert(viaFold.exceptAll(expected).isEmpty && expected.exceptAll(viaFold).isEmpty)
  }

  test("multimodal mapPartitions decode == expression featurization, on " +
    "real image containers and on non-image payloads") {
    // real PNG/JPEG headers (dims parsed from bytes on both paths)
    val assets = Multimodal.syntheticAssets(docs.limit(100))
    assert(Multimodal.decodeAndFeaturize(assets)
      .exceptAll(Multimodal.featurizeExpr(assets)).isEmpty)
    assert(Multimodal.featurizeExpr(assets)
      .exceptAll(Multimodal.decodeAndFeaturize(assets)).isEmpty)
    // text payloads: both paths must agree on null dims
    val mm = Multimodal.fromDocuments(docs.limit(100))
    val viaPartitions = Multimodal.decodeAndFeaturize(mm)
    val viaExpr = Multimodal.featurizeExpr(mm)
    assert(viaPartitions.exceptAll(viaExpr).isEmpty &&
      viaExpr.exceptAll(viaPartitions).isEmpty)
    assert(viaExpr.filter(col("width").isNotNull).isEmpty)
    // null payload (the schema allows it): both paths yield null
    // features — never an executor NPE
    val withNull = mm.withColumn("payload",
      when(col("asset_id") % 2 === 0, col("payload")))
    val np = Multimodal.decodeAndFeaturize(withNull)
    val ne = Multimodal.featurizeExpr(withNull)
    assert(np.exceptAll(ne).isEmpty && ne.exceptAll(np).isEmpty)
    assert(np.filter(col("asset_id") % 2 === 1)
      .filter(col("byte_len").isNotNull || col("content_hash").isNotNull).isEmpty)
  }

  test("exact dedup keeps one row per key") {
    val d = Dedup.exact(docs, Seq("lang"), "doc_id")
    val langs = d.select("lang").collect().map(_.getString(0))
    assert(langs.length == langs.distinct.length)
  }

  test("BinarySlice == builtin substr in-range; long offsets past 2 GiB don't wrap") {
    val payloads = docs.limit(50).select(
      col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    // in-range: bit-identical to the builtin 1-based Int substring
    val diff = payloads.select(
      (call_function("graft_binary_slice", col("payload"), lit(3L), lit(7L)) =!=
        col("payload").substr(lit(4), lit(7))).as("d"))
      .filter(col("d")).count()
    assert(diff == 0)
    // the >2 GiB-offset path, unit-level (no giant fixture): a frame
    // offset computed past Int range must yield an EMPTY slice. The
    // narrowing Int cast the builtin requires would wrap 2^31+2 to a
    // negative position and select wrong bytes instead.
    val bigOff = payloads.select(
      length(call_function("graft_binary_slice",
        col("payload"), lit(Int.MaxValue.toLong + 3L), lit(16L))).as("n"),
      length(call_function("graft_binary_slice",
        col("payload"), lit(3L), lit(Long.MaxValue))).as("clamped"),
      length(col("payload")).as("len"))
    assert(bigOff.filter(col("n") =!= 0).count() == 0)
    // oversize length clamps to the payload end, no overflow
    assert(bigOff.filter(col("clamped") =!= col("len") - 3).count() == 0)
    // null payload stays null; zero/negative length is empty
    val edge = spark.sql(
      """SELECT graft_binary_slice(CAST(NULL AS BINARY), 0L, 4L) AS a,
                graft_binary_slice(X'0102', 0L, 0L) AS b,
                graft_binary_slice(X'0102', -1L, 4L) AS c""").collect()(0)
    assert(edge.isNullAt(0))
    assert(edge.getAs[Array[Byte]](1).isEmpty)
    assert(edge.getAs[Array[Byte]](2).isEmpty)
  }
}
