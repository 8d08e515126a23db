package graft.sources

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[Layout]]: the Z-order key — bit-exact vs a plain-Scala interleave
  * mirror, per-axis monotonicity, aligned-tile locality (the property
  * row-group pruning relies on), the out-of-range guard, and in-file
  * z-ordering through [[Layout.writeZOrdered]]. */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Reference interleave: coordinate j's bit i -> key bit i*n+j. */
  private def zref(coords: Seq[Long], bits: Int): Long = {
    val n = coords.size
    var key = 0L
    for (i <- 0 until bits; j <- 0 until n)
      key |= ((coords(j) >> i) & 1L) << (i * n + j)
    key
  }

  test("zkey == plain-Scala interleave on deterministic pseudo-random coords") {
    val spark2 = spark
    import spark2.implicits._
    val rows = (0 until 500).map { i =>
      val x = (i * 2654435761L) % (1L << 21)
      val y = (i * 40503L + 17) % (1L << 21)
      (x, y)
    }
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.zkey(Seq(col("x"), col("y")), 21).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    for ((x, y, z) <- got) assert(z == zref(Seq(x, y), 21), s"($x,$y)")
    // 3-column variant stays in range and matches too
    val got3 = rows.map { case (x, y) => (x % 1024, y % 1024, (x ^ y) % 1024) }
      .toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        Layout.zkey(Seq(col("a"), col("b"), col("c")), 10).as("z"))
      .collect()
    for (r <- got3)
      assert(r.getLong(3) == zref(Seq(r.getLong(0), r.getLong(1), r.getLong(2)), 10))
  }

  test("zkeySql mirrors zkey through SparkSQL evaluation") {
    val spark2 = spark
    import spark2.implicits._
    Seq((3L, 5L), (0L, 0L), (1023L, 512L), (700L, 701L)).toDF("x", "y")
      .createOrReplaceTempView("zk_t")
    val viaSql = spark.sql(
        s"SELECT x, y, ${Layout.zkeySql(Seq("x", "y"), 10)} AS z FROM zk_t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    for ((x, y, z) <- viaSql) assert(z == zref(Seq(x, y), 10))
  }

  test("per-axis monotonicity and aligned-tile locality") {
    // fixing y, the key is strictly increasing in x (and vice versa)
    for (y <- Seq(0L, 7L, 1000L)) {
      val keys = (0L until 64L).map(x => zref(Seq(x, y), 21))
      assert(keys == keys.sorted && keys.distinct.size == keys.size)
    }
    // every 2^t-aligned tile occupies ONE contiguous key range of 4^t
    // keys — the clustering guarantee behind multi-column min/max pruning
    val t = 4
    for (tx <- Seq(0L, 3L, 17L); ty <- Seq(0L, 5L, 9L)) {
      val keys = for (dx <- 0L until (1L << t); dy <- 0L until (1L << t))
        yield zref(Seq(tx * (1L << t) + dx, ty * (1L << t) + dy), 21)
      assert(keys.max - keys.min == (1L << (2 * t)) - 1)
      assert(keys.distinct.size == (1 << (2 * t)))
    }
  }

  test("coordinates out of [0, 2^bits) raise instead of silently wrapping") {
    val spark2 = spark
    import spark2.implicits._
    val bad = Seq((5L, -1L)).toDF("x", "y")
      .select(Layout.zkey(Seq(col("x"), col("y")), 10))
    val e = intercept[Exception](bad.collect())
    assert(String.valueOf(e.getMessage).contains("zkey coordinate") ||
      String.valueOf(e.getCause).contains("zkey coordinate"))
    val big = Seq((1024L, 0L)).toDF("x", "y")
      .select(Layout.zkey(Seq(col("x"), col("y")), 10))
    assert(intercept[Exception](big.collect()) != null)
  }

  /** Row groups of `file` whose [min,max] column-chunk statistics
    * intersect every (col, lo, hi) box side — exactly the set a
    * statistics-pruning reader must fetch. */
  private def rowGroupsTouched(file: String,
                               box: Seq[(String, Long, Long)]): (Int, Int) = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file),
      spark.sparkContext.hadoopConfiguration)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val touched = blocks.count { b =>
        box.forall { case (name, lo, hi) =>
          val cc = b.getColumns.asScala
            .find(_.getPath.toDotString == name).get
          val st: org.apache.parquet.column.statistics.Statistics[_] =
            cc.getStatistics
          val mn = st.genericGetMin.asInstanceOf[java.lang.Long].longValue()
          val mx = st.genericGetMax.asInstanceOf[java.lang.Long].longValue()
          mx >= lo && mn <= hi
        }
      }
      (touched, blocks.size)
    } finally reader.close()
  }

  test("z-ordered row groups prune on BOTH axes where a linear sort serves one") {
    val spark2 = spark
    import spark2.implicits._
    // 64k points on a 256x256 grid, written as ONE file with ~1k-row row
    // groups (tiny parquet.block.size forces frequent flushes)
    val pts = (0 until 65536).map(i => (i / 256L, (i * 2654435761L) % 256L))
    def writeSorted(key: org.apache.spark.sql.Column): String = {
      val dir = Files.createTempDirectory("graft_zprune").toString
      pts.toDF("x", "y").withColumn("k", key)
        .coalesce(1).sortWithinPartitions("k")
        .write.option("parquet.block.size", 8 * 1024)
        .mode("overwrite").parquet(dir)
      Files.list(Paths.get(dir)).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get.toString
    }
    val linear = writeSorted(col("x")) // 1-D sort: x clustered, y random
    val zfile = writeSorted(Layout.zkey(Seq(col("x"), col("y")), 8))
    // a y-only slice: the x-sorted layout cannot prune it at all
    val ySlice = Seq(("y", 10L, 20L))
    val (linY, linN) = rowGroupsTouched(linear, ySlice)
    val (zY, zN) = rowGroupsTouched(zfile, ySlice)
    assert(linN >= 8 && zN >= 8, s"need multiple row groups, got $linN/$zN")
    assert(linY == linN, "x-sorted layout reads EVERY group for a y slice")
    assert(zY * 2 <= zN, s"z-order must skip >= half the groups ($zY/$zN)")
    // a 2-D box: z-order prunes harder than the linear sort
    val box = Seq(("x", 0L, 31L), ("y", 0L, 31L))
    val (linB, _) = rowGroupsTouched(linear, box)
    val (zB, _) = rowGroupsTouched(zfile, box)
    assert(zB.toDouble / zN < linB.toDouble / linN,
      s"z box fraction $zB/$zN vs linear $linB/$linN")
  }

  test("writeZOrdered: every output file is internally z-key sorted") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "lang", "n_chars")
    val out = Files.createTempDirectory("graft_zorder").toString
    Layout.writeZOrdered(docs, out, partitionCols = Seq("lang"),
      saltCol = "doc_id",
      zorderCols = Seq(pmod(col("n_chars"), lit(1L << 21)),
        pmod(col("doc_id"), lit(1L << 21))),
      bits = 21, filesPerPartition = 2)
    val files = Files.walk(Paths.get(out)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
    assert(files.nonEmpty)
    for (f <- files) {
      val zs = spark.read.parquet(f.toString)
        .select("zkey").collect().map(_.getLong(0))
      assert(zs.sameElements(zs.sorted), s"$f not z-ordered")
    }
    // round trip: all rows survive with their z-keys
    assert(spark.read.parquet(out).count() == docs.count())
  }
}
