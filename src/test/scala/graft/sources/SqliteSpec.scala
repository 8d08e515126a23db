package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The fixtures under src/test/resources/sqlite/ were generated once with
  * the stock sqlite3 library; expected values are recorded here (and, for
  * nation.db, cross-checked against the driver's parquet copy of the same
  * table in q47's DuckDB oracle).
  *   - nation.db: the fixed 25-row TPC-H nation table
  *   - types.db: serial-type coverage (all int widths, floats, text, blob,
  *     NULL, empty string/blob, INTEGER PRIMARY KEY rowid alias)
  *   - big.db: 1500 rows over a multi-page b-tree (interior pages) with 50
  *     payloads > page size (overflow chains)
  */
class SqliteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixture(name: String): String =
    getClass.getResource(s"/sqlite/$name").getPath

  test("nation.db matches the parquet nation table row-for-row") {
    val db = Sqlite.scan(spark, fixture("nation.db"), "nation")
      .select(col("n_nationkey").cast("int"), col("n_name"),
        col("n_regionkey").cast("int"))
    val pq = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
      .select("n_nationkey", "n_name", "n_regionkey")
    assert(db.count() == 25)
    assert(db.exceptAll(pq).isEmpty && pq.exceptAll(db).isEmpty)
  }

  test("scanGlob: executor-side decode of many shards == per-file scans " +
    "unioned; provenance per file; loud errors") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sqlite_glob")
    for (i <- 0 until 3)
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(fixture("nation.db")),
        dir.resolve(s"shard$i.db"))
    val glob = Sqlite.scanGlob(spark, s"$dir/shard*.db", "nation")
    assert(glob.count() == 75)
    // 3 distinct provenance paths, 25 rows each
    val perFile = glob.groupBy("Path").count().collect()
    assert(perFile.length == 3 && perFile.forall(_.getLong(1) == 25))
    // data columns equal one single-file scan replicated 3x
    val one = Sqlite.scan(spark, fixture("nation.db"), "nation")
      .select("n_nationkey", "n_name", "n_regionkey")
    val tripled = one.unionByName(one).unionByName(one)
    val got = glob.select("n_nationkey", "n_name", "n_regionkey")
    assert(got.exceptAll(tripled).isEmpty && tripled.exceptAll(got).isEmpty)
    // rows decode in the tasks: the scan RDD has one partition per file
    assert(glob.rdd.getNumPartitions == 3)
    // schema mismatch across files fails loudly
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(fixture("types.db")), dir.resolve("zz.db"))
    val bad = intercept[Exception](
      Sqlite.scanGlob(spark, s"$dir/*.db", "nation").count())
    assert(String.valueOf(bad.getMessage).contains("not found") ||
      String.valueOf(bad.getCause).toString.contains("not found"))
    // empty glob fails loudly
    assertThrows[Sqlite.SqliteError](
      Sqlite.scanGlob(spark, s"$dir/none*.db", "nation"))
  }

  test("scanGlob size contract: a file above maxFileBytes fails the " +
    "pre-flight loudly (one .db = one sequential task) — and passes " +
    "when the cap is raised deliberately") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sqlite_size")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(fixture("nation.db")), dir.resolve("a.db"))
    val len = java.nio.file.Files.size(dir.resolve("a.db"))
    val err = intercept[Sqlite.SqliteError](
      Sqlite.scanGlob(spark, s"$dir/*.db", "nation", maxFileBytes = len - 1))
    assert(err.getMessage.contains("ONE task per .db"), err.getMessage)
    assert(Sqlite.scanGlob(spark, s"$dir/*.db", "nation",
      maxFileBytes = len).count() == 25)
  }

  test("types.db decodes every serial type and the rowid-alias pk") {
    val t = Sqlite.readTable(spark, fixture("types.db"), "t")
    assert(t.columns == Seq("pk", "i", "f", "s", "b"))
    assert(t.rows.length == 13)
    val byPk = t.rows.map(r => r(0).asInstanceOf[Long] -> r).toMap
    assert(byPk.keySet == (1L to 13L).toSet) // rowid alias substituted
    assert(byPk(1L)(1) == 0L && byPk(1L)(2) == 0.0 && byPk(1L)(3) == "")
    assert(byPk(1L)(4).asInstanceOf[Array[Byte]].isEmpty)
    assert(byPk(2L)(4).asInstanceOf[Array[Byte]].toSeq == Seq[Byte](0, 1))
    assert(byPk(3L)(1) == -1L && byPk(3L)(2) == -1.5)
    assert(byPk(4L)(1) == 127L && byPk(4L)(2) == 3.14159)
    assert(byPk(5L)(1) == -129L && byPk(5L)(2) == 2.5e300)
    assert(byPk(5L)(3) == "utf8: é中文")
    assert(byPk(6L)(1) == 32767L && byPk(6L)(2) == -2.5e-300 && byPk(6L)(3) == null)
    assert(byPk(7L)(1) == -40000L && byPk(7L)(2) == 1e15)
    assert(byPk(8L)(1) == (1L << 31) - 1 && byPk(8L)(2) == 0.125)
    assert(byPk(9L)(1) == -(1L << 31) - 7 && byPk(9L)(2) == -0.125)
    assert(byPk(10L)(1) == (1L << 47) + 11)
    assert(byPk(11L)(1) == (1L << 62) + 3 && byPk(11L)(2) == 123456.789)
    assert(byPk(12L)(1) == -(1L << 62) - 9)
    assert((1 to 4).forall(i => byPk(13L)(i) == null))
  }

  test("types.db DataFrame schema promotes per column") {
    val df = Sqlite.scan(spark, fixture("types.db"), "t")
    val dt = df.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(dt("pk") == "long" && dt("i") == "long" && dt("f") == "double")
    assert(dt("s") == "string" && dt("b") == "binary")
    assert(dt("File") == "string") // provenance attached
    assert(df.where(col("File") === "types.db").count() == 13)
  }

  test("big.db traverses interior pages and overflow chains") {
    val df = Sqlite.scan(spark, fixture("big.db"), "docs")
    val agg = df.agg(
      count(lit(1)).as("n"), sum("id").as("sid"),
      sum(length(col("body"))).as("slen"),
      countDistinct("grp").as("g")).head()
    assert(agg.getLong(0) == 1500L)
    assert(agg.getLong(1) == 1124250L)
    assert(agg.getLong(2) == 833425L)
    assert(agg.getLong(3) == 7L)
    val groups = df.groupBy("grp").agg(count(lit(1)).as("n"), sum("val").as("sv"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(groups.toSeq == Seq(
      ("g0", 215L, 80517.5), ("g1", 215L, 80625.0), ("g2", 214L, 79982.5),
      ("g3", 214L, 80089.5), ("g4", 214L, 80196.5), ("g5", 214L, 80303.5),
      ("g6", 214L, 80410.5)))
  }

  test("missing table and CREATE TABLE parsing edge cases") {
    val e = intercept[Sqlite.SqliteError] {
      Sqlite.readTable(spark, fixture("nation.db"), "nope")
    }
    assert(e.msg.contains("not found"))
    val (cols, alias) = Sqlite.parseCreateTable(
      """CREATE TABLE "x y" ([a b] INTEGER PRIMARY KEY, "c,d" NUMERIC(10,2),
        | e TEXT CHECK(e IN ('p,q', 'r')), PRIMARY KEY (e))""".stripMargin)
    assert(cols == Seq("a b", "c,d", "e"))
    assert(alias.contains(0))
  }
}
