package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Avro object-container files, hand-rolled from the published spec:
  * zigzag golden vectors, schema JSON round trip, write/read round
  * trips over both codecs incl. nulls and arrays, SPLIT-read
  * equivalence at every split size (the sync-marker scale path), and
  * the loud-failure matrix. */
class AvroSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def zig(n: Long): Seq[Int] = {
    val out = new java.io.ByteArrayOutputStream()
    Avro.writeZigZag(out, n)
    out.toByteArray.toSeq.map(_ & 0xFF)
  }

  test("zigzag varints match the published golden vectors") {
    assert(zig(0L) == Seq(0x00))
    assert(zig(-1L) == Seq(0x01))
    assert(zig(1L) == Seq(0x02))
    assert(zig(-2L) == Seq(0x03))
    assert(zig(-64L) == Seq(0x7f))
    assert(zig(64L) == Seq(0x80, 0x01))
    assert(zig(Long.MaxValue) ==
      Seq(0xfe, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0x01))
    assert(zig(Long.MinValue) ==
      Seq(0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0x01))
  }

  test("schema json round-trips the full declared subset") {
    val schema = StructType(Seq(
      StructField("s", StringType, nullable = false),
      StructField("sn", StringType, nullable = true),
      StructField("i", IntegerType, nullable = false),
      StructField("l", LongType, nullable = true),
      StructField("f", FloatType, nullable = false),
      StructField("d", DoubleType, nullable = true),
      StructField("b", BooleanType, nullable = false),
      StructField("y", BinaryType, nullable = false),
      StructField("al", ArrayType(LongType, containsNull = false),
        nullable = false),
      StructField("as", ArrayType(StringType, containsNull = false),
        nullable = true)))
    val fields = Avro.fieldsOf(schema)
    val json = Avro.schemaJson(fields)
    assert(Avro.parseSchemaJson(json) == fields)
    // foreign-writer whitespace + extra attributes tolerated
    val decorated = json
      .replace("{\"type\":\"record\"",
        "{ \"namespace\" : \"x.y\", \"doc\": \"hi\", \"type\":\"record\"")
      .replace(",", " , ")
    assert(Avro.parseSchemaJson(decorated) == fields)
  }

  test("schema parser rejects what the subset excludes, loudly") {
    def bad(json: String, frag: String): Unit = {
      val e = intercept[Avro.AvroError](Avro.parseSchemaJson(json))
      assert(e.getMessage.contains(frag), s"msg=${e.getMessage}")
    }
    bad("""{"type":"record","name":"r","fields":[
            {"name":"m","type":{"type":"map","values":"long"}}]}""",
      "unsupported complex type")
    bad("""{"type":"record","name":"r","fields":[
            {"name":"e","type":{"type":"enum","name":"E","symbols":["A"]}}]}""",
      "unsupported complex type")
    bad("""{"type":"record","name":"r","fields":[
            {"name":"u","type":["string","long"]}]}""",
      "union must lead")
    bad(""""long"""", "must be a record")
  }

  private def roundTripDf() = {
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("w", DoubleType, nullable = true),
      StructField("f", FloatType, nullable = false),
      StructField("ok", BooleanType, nullable = false),
      StructField("blob", BinaryType, nullable = false),
      StructField("xs", ArrayType(LongType, containsNull = false),
        nullable = false)))
    val rows = (0 until 500).map { i =>
      Row(i.toLong,
        if (i % 5 == 0) null else s"name-$i é中",
        if (i % 7 == 0) null else i / 8.0,
        i / 4.0f,
        i % 2 == 0,
        Array.tabulate[Byte](i % 5)(k => (i + k).toByte),
        (0L until (i % 4).toLong).toSeq)
    }
    spark.createDataFrame(rows.asJava, schema)
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select(col("id"), col("name"), col("w"), col("f"), col("ok"),
        hex(col("blob")).as("blob"),
        concat_ws("|", col("xs").cast("array<string>")).as("xs"))
      .collect()
      .map(_.toString)
      .toSet

  for (codec <- Seq("null", "deflate"))
    test(s"write/read round-trips values, nulls, arrays ($codec codec)") {
      val dir = Files.createTempDirectory(s"avro_rt_$codec").toString
      val df = roundTripDf()
      Avro.write(df, dir, files = 3, saltCol = "id", codec = codec,
        blockRows = 64)
      val back = Avro.read(spark, s"$dir/*.avro")
      assert(back.columns.toSeq ==
        Seq("file", "id", "name", "w", "f", "ok", "blob", "xs"))
      assert(canon(back.drop("file")) == canon(df))
    }

  test("split reads agree with the whole-file read at every split size " +
    "and actually fan out") {
    val dir = Files.createTempDirectory("avro_split").toString
    // one shard, many small blocks -> many sync points inside one file
    val df = roundTripDf()
    Avro.write(df.withColumn("pad",
        concat_ws("", array_repeat(lit("x"), 400))),
      dir, files = 1, saltCol = "id", codec = "null", blockRows = 8)
    val whole = Avro.read(spark, s"$dir/*.avro", splitBytes = 1L << 30)
    assert(whole.rdd.getNumPartitions == 1)
    val split = Avro.read(spark, s"$dir/*.avro", splitBytes = 1L << 16)
    assert(split.rdd.getNumPartitions > 1,
      "a 200+ KB shard at 64 KiB splits must plan multiple tasks")
    assert(canon(split.drop("file", "pad")) == canon(df))
    assert(split.count() == 500 && whole.count() == 500)
  }

  test("mixed-codec shards read through one glob") {
    val dir = Files.createTempDirectory("avro_mixed").toString
    val df = roundTripDf()
    Avro.write(df.filter(col("id") % 2 === 0), s"$dir/a", files = 1,
      saltCol = "id", codec = "deflate", blockRows = 32)
    Avro.write(df.filter(col("id") % 2 =!= 0), s"$dir/b", files = 1,
      saltCol = "id", codec = "null", blockRows = 32)
    val back = Avro.read(spark, s"$dir/*/part-*.avro")
    assert(canon(back.drop("file")) == canon(df))
  }

  test("loud failures: bad magic, schema drift, unsupported write type, " +
    "corrupt sync") {
    val dir = Files.createTempDirectory("avro_bad").toString
    val df = roundTripDf()
    Avro.write(df, s"$dir/ok", files = 1, saltCol = "id", blockRows = 64)
    val shard = Paths.get(s"$dir/ok/part-00000.avro")

    // not a container
    val junk = Paths.get(s"$dir/junk.avro")
    Files.write(junk, "PAR1 not avro".getBytes)
    val e1 = intercept[Avro.AvroError](Avro.read(spark, junk.toString))
    assert(e1.getMessage.contains("bad magic"))

    // schema drift across shards
    Avro.write(df.select(col("id")), s"$dir/drift", files = 1, saltCol = "id")
    val e2 = intercept[Avro.AvroError](
      Avro.read(spark, s"$dir/{ok,drift}/part-*.avro"))
    assert(e2.getMessage.contains("schema drift"))

    // unsupported column type is a plan-time refusal
    val e3 = intercept[Avro.AvroError](
      Avro.write(df.select(struct(col("id")).as("s")), s"$dir/nested",
        files = 1, saltCol = "s"))
    assert(e3.getMessage.contains("unsupported type"))

    // flip one byte of the first block's sync marker -> loud corruption
    val bytes = Files.readAllBytes(shard)
    val sync = Avro.syncFor(
      Avro.schemaJson(Avro.fieldsOf(df.schema)), 0)
    // header ends with the first occurrence of sync; the NEXT
    // occurrence terminates block 1 — corrupt that one
    def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
      var i = from
      while (i <= hay.length - needle.length) {
        var k = 0
        while (k < needle.length && hay(i + k) == needle(k)) k += 1
        if (k == needle.length) return i
        i += 1
      }
      -1
    }
    val h = indexOf(bytes, sync, 0)
    val b1 = indexOf(bytes, sync, h + 16)
    assert(h >= 0 && b1 > h)
    bytes(b1 + 3) = (bytes(b1 + 3) ^ 0x5A).toByte
    val corrupt = Paths.get(s"$dir/corrupt.avro")
    Files.write(corrupt, bytes)
    val e4 = intercept[org.apache.spark.SparkException](
      Avro.read(spark, corrupt.toString).count())
    assert(e4.getMessage.contains("sync marker mismatch") ||
      Option(e4.getCause).exists(_.getMessage.contains("sync marker mismatch")))
  }
}
