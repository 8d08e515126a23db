package graft.expressions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Differential pin: `graft_csv_fields(line, n)` must be value-identical
  * to the `from_csv(line, <n all-string fields>, ignoreLeadingWhiteSpace
  * =true)` it replaced in the recipe wholetext scan — element by element,
  * null for null — over (a) every line of the real recipe fixture corpus,
  * (b) a handcrafted quoting/escaping/whitespace gauntlet, and (c) a
  * seeded random fuzz over a quote/escape/delimiter-heavy alphabet.
  *
  * Newlines are excluded from the fuzz alphabet deliberately: the
  * expression's contract is ONE record (CsvSource feeds linesIterator
  * output, which never contains a line terminator), while from_csv would
  * stop at the first embedded terminator.
  */
class CsvLineFieldsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Lines where the two parsers disagree, with both renderings. */
  private def mismatches(lines: Seq[String], n: Int): Seq[String] = {
    val schema = StructType((0 until n).map(i => StructField(s"c$i", StringType)))
    val rows = lines.toDF("line")
      .select(col("line"),
        from_csv(col("line"), schema, Map("ignoreLeadingWhiteSpace" -> "true")).as("r"),
        call_function("graft_csv_fields", col("line"), lit(n)).as("a"))
      .collect()
    rows.toSeq.flatMap { row =>
      val line = row.getString(0)
      val s = row.getStruct(1)
      val expected = (0 until n).map(i => Option(s.getString(i)))
      val arr = row.getSeq[String](2)
      val got = arr.map(Option(_))
      if (expected != got)
        Some(s"line=${escape(line)} n=$n from_csv=${render(expected)} graft=${render(got)}")
      else None
    }
  }

  private def render(vs: Seq[Option[String]]): String =
    vs.map(_.map(v => "'" + escape(v) + "'").getOrElse("NULL")).mkString("[", ",", "]")
  private def escape(s: String): String =
    s.flatMap(c => if (c < ' ') f"\\x${c.toInt}%02x" else c.toString)

  private def assertSame(lines: Seq[String], ns: Seq[Int] = Seq(1, 2, 3, 5)): Unit =
    for (n <- ns) {
      val bad = mismatches(lines, n)
      assert(bad.isEmpty, s"\n${bad.take(20).mkString("\n")}\n(${bad.size} mismatches)")
    }

  test("handcrafted gauntlet: quoting, escapes, whitespace, width") {
    assertSame(Seq(
      "a,b,c", " a , b ,c ", "a,,c", ",", ",,", "", "   ", "\ta",
      "a\tb,c", "a,\t,b", "1.5,2,-3e4", "#x,y", "a,#b",
      "a,b,c,d,e,f,g,h", "justone",
      "\"a,b\",c", "\"a\"\"b\",c", "\"a\\\"b\",c", "a\"b,c", "\"ab\" ,c",
      "\"ab\"x,c", "\"ab\" x,c", "ab\",c", "\"unclosed", "\"a,b", "\"\",x",
      " \"a\" ,b", "x,\"\"", "\\,a", "a\\\\,b", "a\\b,c", "\"a\\\\\",b",
      "\"  a  \",b", "  \"a b\"  ,c", "\"ab\",c", "ab,c",
      "é,中 文", " é, x", "\"é\",中", ",a", "a,"))
  }

  test("seeded fuzz over a quote/escape/delimiter-heavy alphabet") {
    val alphabet = ",\"\\ \ta1.#é中"
    val rnd = new scala.util.Random(20260818L)
    val lines = Seq.fill(40000) {
      val len = rnd.nextInt(25)
      val sb = new StringBuilder
      (0 until len).foreach(_ => sb.append(alphabet.charAt(rnd.nextInt(alphabet.length))))
      sb.toString
    }.distinct
    assertSame(lines, ns = Seq(1, 3))
  }

  test("every line of the real recipe fixture corpus") {
    val root = graft.corpus.ReferenceCorpus.ensure(spark, TestSpark.sfDir)
    def walk(dir: java.io.File): Seq[java.io.File] =
      Option(dir.listFiles).map(_.toSeq).getOrElse(Nil).flatMap { f =>
        if (f.isDirectory) walk(f)
        else if (f.getName.endsWith(".out") || f.getName.endsWith(".csv")) Seq(f)
        else Nil
      }
    val lines = walk(new java.io.File(root)).flatMap { f =>
      scala.io.Source.fromFile(f, "UTF-8").getLines().toList
    }.filter(_.nonEmpty).distinct
    assert(lines.nonEmpty)
    assertSame(lines, ns = Seq(1, 4, 8))
  }
}
