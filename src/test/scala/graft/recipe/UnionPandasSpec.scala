package graft.recipe

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** pandas `pd.concat` dtype-parity of the recipe union: a column whose
  * type differs across inputs must become object-like (string) unless
  * every occurrence is numeric (int64+float64 -> float64), and values
  * must survive verbatim — Spark's own ANSI union coercion would instead
  * pick the numeric side and throw at runtime on 'Serial' meeting a
  * bigint (the df_regr x sklearn child union). */
class UnionPandasSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def engine = new Benchmark(
    Recipe.loadString("input:\n    path: unused\naggregation: mean\nvalues: [v]\naxis: [k]\nseries: [s]\n", "."),
    spark)

  test("string + long widens to string, values verbatim") {
    val a = Seq(("Serial", 1L), ("16", 2L)).toDF("threads", "id")
    val b = Seq((4L, 3L), (16L, 4L)).toDF("threads", "id")
    val u = engine.unionPandas(Seq(a, b))
    assert(u.schema("threads").dataType == StringType)
    val vals = u.orderBy("id").select("threads").as[String].collect().toSeq
    assert(vals == Seq("Serial", "16", "4", "16"))
  }

  test("long + double widens to double (pandas int64+float64 -> float64)") {
    val a = Seq((10000L, 1L)).toDF("Size", "id")
    val b = Seq((2.5, 2L)).toDF("Size", "id")
    val u = engine.unionPandas(Seq(a, b))
    assert(u.schema("Size").dataType == DoubleType)
    assert(u.orderBy("id").select("Size").as[Double].collect().toSeq == Seq(10000.0, 2.5))
  }

  test("missing columns pad with null; same-typed columns keep their type") {
    val a = Seq((1L, "x")).toDF("id", "only_a")
    val b = Seq((2L, 3.5)).toDF("id", "only_b")
    val u = engine.unionPandas(Seq(a, b))
    assert(u.schema("id").dataType == LongType)
    assert(u.schema("only_a").dataType == StringType)
    assert(u.schema("only_b").dataType == DoubleType)
    val rows = u.orderBy("id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("only_b")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("only_a")))
  }

  test("case-sensitive: 'Classes' and 'classes' stay distinct padded columns") {
    val a = Seq(("2", 1L)).toDF("Classes", "id")
    val b = Seq((4L, 2L)).toDF("classes", "id")
    val u = engine.unionPandas(Seq(a, b))
    assert(u.columns.count(_.equalsIgnoreCase("classes")) == 2)
    assert(u.schema("Classes").dataType == StringType)
    assert(u.schema("classes").dataType == LongType)
    val r = u.orderBy("id").collect()
    assert(r(0).getAs[String]("Classes") == "2" && r(0).isNullAt(r(0).fieldIndex("classes")))
    assert(r(1).getAs[Long]("classes") == 4L && r(1).isNullAt(r(1).fieldIndex("Classes")))
  }
}
