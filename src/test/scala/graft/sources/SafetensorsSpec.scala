package graft.sources

import java.nio.file.Files
import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The safetensors embedding shards: bit-exact round trips (NaN
  * payloads, signed zeros, subnormals included), the public header
  * layout (LE u64 length + JSON + 8-byte alignment), the hand-rolled
  * header parser, loud structural validation, and determinism. */
class SafetensorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def chainContains(t: Throwable, msg: String): Boolean =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
      .exists(e => Option(e.getMessage).exists(_.contains(msg)))

  private def df(rows: Seq[(Long, Int, Seq[Float])]) = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "label", "embedding")
  }

  test("write -> read round-trips every float BIT-exactly") {
    val weird = Seq(Float.NaN,
      java.lang.Float.intBitsToFloat(0x7fc00001), // NaN with payload
      -0.0f, 0.0f, Float.MinPositiveValue, Float.MaxValue,
      Float.NegativeInfinity, 1.5f)
    val rows = (0L until 23L).map(i =>
      (i, i.toInt % 3, weird.map(w => w + i * 0.25f))) :+
      (23L, 9, weird) // the raw weird row: + 0.0f would quiet payloads
    val dir = Files.createTempDirectory("graft_st").toString
    Safetensors.writeEmbeddings(df(rows), "vec_id", "label", "embedding",
      dir, files = 3)
    val got = Safetensors.readEmbeddings(spark, s"$dir/*.safetensors")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toSeq))
      .sortBy(_._1).toSeq
    assert(got.map(r => (r._1, r._2)) == rows.map(r => (r._1, r._2)))
    for ((g, w) <- got.zip(rows)) {
      val gb = g._3.map(java.lang.Float.floatToRawIntBits)
      val wb = w._3.map(java.lang.Float.floatToRawIntBits)
      assert(gb == wb, s"vec ${g._1} bits differ")
    }
  }

  test("the file layout is the public spec: LE u64 len, JSON, aligned buffer") {
    val dir = Files.createTempDirectory("graft_st_layout").toString
    Safetensors.writeEmbeddings(
      df(Seq((1L, 5, Seq(1f, 2f, 3f)), (2L, 6, Seq(4f, 5f, 6f)))),
      "vec_id", "label", "embedding", dir, files = 1)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".safetensors")).head
    val bytes = Files.readAllBytes(f.toPath)
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val hlen = bb.getLong
    assert((8 + hlen) % 8 == 0, "header must pad to 8-byte alignment")
    val json = new String(bytes, 8, hlen.toInt, "UTF-8")
    val header = Safetensors.parseHeader(json)
    assert(header.keySet == Set("ids", "labels", "embeddings"))
    val mv = header("embeddings")
    assert(mv.dtype == "F32" && mv.shape == Seq(2L, 3L))
    assert(header("ids").dtype == "I64" && header("ids").shape == Seq(2L))
    assert(header("labels").dtype == "I32")
    // buffer = ids(16) + labels(8) + vecs(24), file ends exactly there
    assert(bytes.length == 8 + hlen + 16 + 8 + 24)
    // ids sort by id within the shard and land first in the buffer
    val ids = ByteBuffer.wrap(bytes, (8 + hlen).toInt, 16)
      .order(ByteOrder.LITTLE_ENDIAN)
    assert(ids.getLong == 1L && ids.getLong == 2L)
  }

  test("parseHeader: metadata skipped, escapes, loud errors") {
    val h = Safetensors.parseHeader(
      """{"__metadata__":{"k":"v A"},
         "t":{"dtype":"F32","shape":[2,4],"data_offsets":[0,32]}}""")
    assert(h.keySet == Set("t") && h("t").shape == Seq(2L, 4L))
    assert(Safetensors.parseHeader("{}").isEmpty)
    val e = intercept[Safetensors.SafetensorsError] {
      Safetensors.parseHeader("""{"t":{"dtype":"F32","shape":[1]}}""")
    }
    assert(e.msg.contains("missing dtype/shape/data_offsets"))
    val e2 = intercept[Safetensors.SafetensorsError] {
      Safetensors.parseHeader("""{"t":{"dtype":"F32","other":1}}""")
    }
    assert(e2.msg.contains("unknown tensor field"))
  }

  test("ragged dimensions and null vectors fail the write loudly") {
    val dir = Files.createTempDirectory("graft_st_bad").toString
    val e = intercept[org.apache.spark.SparkException] {
      Safetensors.writeEmbeddings(
        df(Seq((1L, 0, Seq(1f, 2f)), (2L, 0, Seq(1f)))),
        "vec_id", "label", "embedding", dir, 1)
    }
    assert(chainContains(e, "ragged embeddings"))
    val s = spark
    import s.implicits._
    val withNull = Seq((1L, 0, Option(Seq(1f))), (2L, 0, Option.empty[Seq[Float]]))
      .toDF("vec_id", "label", "embedding")
    val e2 = intercept[org.apache.spark.SparkException] {
      Safetensors.writeEmbeddings(withNull, "vec_id", "label", "embedding",
        Files.createTempDirectory("graft_st_bad2").toString, 1)
    }
    assert(chainContains(e2, "null embedding"))
  }

  test("structural damage fails loudly: dtype swap, truncation, bad length") {
    val dir = Files.createTempDirectory("graft_st_dmg").toString
    Safetensors.writeEmbeddings(df(Seq((1L, 0, Seq(1f, 2f)))),
      "vec_id", "label", "embedding", dir, 1)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".safetensors")).head
    val orig = Files.readAllBytes(f.toPath)
    def rewrite(bytes: Array[Byte]): Unit = {
      Files.write(f.toPath, bytes)
      new java.io.File(f.getParentFile, "." + f.getName + ".crc").delete()
    }

    // same-length dtype swap inside the JSON header
    val s = new String(orig, "ISO-8859-1").replaceFirst("I32", "I16")
    rewrite(s.getBytes("ISO-8859-1"))
    val e1 = intercept[Exception] {
      Safetensors.readEmbeddings(spark, s"$dir/*.safetensors").count()
    }
    assert(chainContains(e1, "is I16, expected I32"))

    // truncated buffer: file length disagrees with the header
    rewrite(orig.dropRight(4))
    val e2 = intercept[Exception] {
      Safetensors.readEmbeddings(spark, s"$dir/*.safetensors").count()
    }
    assert(chainContains(e2, "header expects"))

    // implausible header length
    val broken = orig.clone()
    ByteBuffer.wrap(broken).order(ByteOrder.LITTLE_ENDIAN).putLong(-5L)
    rewrite(broken)
    val e3 = intercept[Exception] {
      Safetensors.readEmbeddings(spark, s"$dir/*.safetensors").count()
    }
    assert(chainContains(e3, "implausible header length"))
    rewrite(orig)
  }

  test("shard layout is deterministic across rewrites") {
    val rows = (0L until 40L).map(i => (i, i.toInt % 5, Seq(i * 1f, i * 2f)))
    val d1 = Files.createTempDirectory("graft_st_a").toString
    val d2 = Files.createTempDirectory("graft_st_b").toString
    Safetensors.writeEmbeddings(df(rows), "vec_id", "label", "embedding", d1, 4)
    Safetensors.writeEmbeddings(df(rows.reverse), "vec_id", "label",
      "embedding", d2, 4)
    for (i <- 0 until 4) {
      val f1 = new java.io.File(d1, f"part-$i%05d.safetensors")
      val f2 = new java.io.File(d2, f"part-$i%05d.safetensors")
      assert(f1.exists == f2.exists)
      if (f1.exists)
        assert(java.util.Arrays.equals(
          Files.readAllBytes(f1.toPath), Files.readAllBytes(f2.toPath)),
          s"shard $i differs between identical writes")
    }
  }
}
