package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** TFRecord + tf.train.Example, hand-rolled from the published specs:
  * framing CRCs (golden vectors), proto round trips incl. the unpacked
  * encodings conformant parsers must accept, the distributed
  * write/read round trip, and the loud-failure matrix. */
class TfRecordSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("maskCrc matches the published LevelDB/TF masking on the " +
    "canonical crc32c vector") {
    // crc32c("123456789") = 0xE3069283 (the canonical check value);
    // mask = ror15 + 0xa282ead8 -> 0xC78AB0E5 (independently computed)
    val c = new java.util.zip.CRC32C
    c.update("123456789".getBytes("ASCII"))
    assert(c.getValue.toInt == 0xE3069283)
    assert(TfRecord.maskCrc(0xE3069283) == 0xC78AB0E5)
    // 8-byte LE length 5: crc 0xE4094DC0, masked 0x3E04B2EA
    assert(TfRecord.maskCrc(0xE4094DC0) == 0x3E04B2EA)
  }

  test("example proto round-trips all three kinds, multi-values and " +
    "empty lists") {
    val feats = Seq(
      ("txt", 1, Seq[Any]("hello".getBytes("UTF-8"), Array[Byte](0, 1, 2))),
      ("ids", 3, Seq[Any](7L, -3L, Long.MaxValue, 0L)),
      ("emb", 2, Seq[Any](1.5f, -0.25f, Float.MinPositiveValue)),
      ("none", 3, Seq.empty[Any]))
    val parsed = TfRecord.parseExample(TfRecord.exampleBytes(feats))
    assert(parsed("txt")._1 == 1)
    assert(parsed("txt")._2.map(_.asInstanceOf[Array[Byte]].toSeq) ==
      Seq(Seq[Byte]('h', 'e', 'l', 'l', 'o'), Seq[Byte](0, 1, 2)))
    assert(parsed("ids") == ((3, Vector(7L, -3L, Long.MaxValue, 0L))))
    assert(parsed("emb") == ((2, Vector(1.5f, -0.25f, Float.MinPositiveValue))))
    // empty list: the kind byte still rides (field tag with empty body)
    assert(parsed("none")._2.isEmpty)
  }

  test("parser accepts UNPACKED scalar encodings and skips unknown fields") {
    // hand-craft: Example{features{entry{key="n", Feature{Int64List{
    //   value=5 (unpacked varint, field 1 wire 0),
    //   value=6 (unpacked)}}}}} plus an unknown varint field in Feature
    def varint(v: Long): Seq[Byte] = {
      var x = v; val out = Seq.newBuilder[Byte]
      while ((x & ~0x7FL) != 0) { out += ((x & 0x7F) | 0x80).toByte; x >>>= 7 }
      out += x.toByte; out.result()
    }
    def ld(field: Int, body: Seq[Byte]): Seq[Byte] =
      varint((field << 3) | 2) ++ varint(body.length) ++ body
    val int64List = varint(8) ++ varint(5) ++ varint(8) ++ varint(6) // field1 wire0 x2
    val feature = ld(3, int64List) ++ varint((9 << 3) | 0) ++ varint(99) // unknown field 9
    val entry = ld(1, "n".getBytes("UTF-8").toSeq) ++ ld(2, feature)
    val example = ld(1, ld(1, entry))
    val parsed = TfRecord.parseExample(example.toArray)
    assert(parsed("n") == ((3, Vector(5L, 6L))))
  }

  test("distributed write/read round trip: every supported type, " +
    "double->f32 downcast declared, nulls as empty lists, shard count") {
    val s = spark
    import s.implicits._
    val out = Files.createTempDirectory("graft_tfrec").toString
    val df = Seq(
      (1L, "alpha", Array[Byte](1, 2), 0.125, Seq(1L, 2L), Seq(0.5f, 1.5f), Seq("a", "b")),
      (2L, "beta", Array[Byte](3), 2.5, Seq.empty[Long], Seq.empty[Float], Seq.empty[String]),
      (3L, null.asInstanceOf[String], Array.empty[Byte], -0.75, Seq(9L), Seq(2.25f), Seq("z"))
    ).toDF("id", "name", "blob", "score", "ids", "vals", "tags")
    TfRecord.write(df, out, files = 2, saltCol = "id")
    val shards = Files.list(Paths.get(out)).iterator()
    val names = scala.jdk.CollectionConverters.IteratorHasAsScala(shards)
      .asScala.map(_.getFileName.toString).filter(_.endsWith(".tfrecord")).toSeq
    // empty salt-partitions write no file (the Warc posture), so with 3
    // rows the count is 1..2; the content round trip is the real claim
    assert(names.nonEmpty && names.size <= 2, names)
    val back = TfRecord.read(spark, s"$out/*.tfrecord", Seq(
        "id" -> "int64", "name" -> "bytes", "blob" -> "bytes",
        "score" -> "float", "ids" -> "int64", "vals" -> "float",
        "tags" -> "bytes"))
      .collect().map { r =>
        (r.getSeq[Long](1).head,
          r.getSeq[Array[Byte]](2).map(new String(_, "UTF-8")),
          r.getSeq[Array[Byte]](3).map(_.toSeq),
          r.getSeq[Float](4),
          r.getSeq[Long](5),
          r.getSeq[Float](6),
          r.getSeq[Array[Byte]](7).map(new String(_, "UTF-8")))
      }.sortBy(_._1)
    assert(back.length == 3)
    assert(back(0) == ((1L, Seq("alpha"), Seq(Seq[Byte](1, 2)), Seq(0.125f),
      Seq(1L, 2L), Seq(0.5f, 1.5f), Seq("a", "b"))))
    // empty arrays come back empty; scalar double downcast to f32
    assert(back(1) == ((2L, Seq("beta"), Seq(Seq[Byte](3)), Seq(2.5f),
      Nil, Nil, Nil)))
    // null scalar -> EMPTY list (TF's absent-feature shape)
    assert(back(2)._2 == Nil && back(2)._4 == Seq(-0.75f))
  }

  test("a flipped byte fails the CRC loudly; truncation fails loudly") {
    val s = spark
    import s.implicits._
    val out = Files.createTempDirectory("graft_tfrec_bad").toString
    TfRecord.write(Seq((1L, "x")).toDF("id", "t"), out, 1, "id")
    val f = Paths.get(out, "part-00000.tfrecord")
    val bytes = Files.readAllBytes(f)
    bytes(bytes.length - 6) = (bytes(bytes.length - 6) ^ 0x40).toByte
    Files.write(f, bytes)
    // remove Hadoop's LocalFileSystem sidecar so the TFRECORD-level
    // masked CRC is the layer under test (on checksum-less stores —
    // S3A, raw:// — it is the ONLY integrity layer)
    Files.deleteIfExists(Paths.get(out, ".part-00000.tfrecord.crc"))
    val e = intercept[Exception](
      TfRecord.read(spark, s"$out/*.tfrecord", Seq("id" -> "int64")).count())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("CRC mismatch")), e)
    Files.write(f, java.util.Arrays.copyOfRange(bytes, 0, bytes.length - 7))
    val e2 = intercept[Exception](
      TfRecord.read(spark, s"$out/*.tfrecord", Seq("id" -> "int64")).count())
    assert(msgs(e2).exists(_.contains("truncated")), e2)
  }

  test("unsupported column types and kind mismatches fail loudly") {
    val s = spark
    import s.implicits._
    val e = intercept[TfRecord.TfRecordError](
      TfRecord.write(Seq((1L, true)).toDF("id", "flag"),
        Files.createTempDirectory("graft_tfrec_u").toString, 1, "id"))
    assert(e.getMessage.contains("unsupported type"))
    val out = Files.createTempDirectory("graft_tfrec_k").toString
    TfRecord.write(Seq((1L, "x")).toDF("id", "t"), out, 1, "id")
    val e2 = intercept[Exception](
      TfRecord.read(spark, s"$out/*.tfrecord", Seq("t" -> "int64")).count())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e2).exists(_.contains("expected")), e2)
    // a feature absent from every record reads as empty arrays, not a crash
    val absent = TfRecord.read(spark, s"$out/*.tfrecord",
      Seq("ghost" -> "float")).collect()
    assert(absent.forall(_.getSeq[Float](1).isEmpty))
  }
}
