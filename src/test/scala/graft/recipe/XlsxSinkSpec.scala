package graft.recipe

import java.nio.file.{Files, Path}
import java.util.zip.ZipFile

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** K4 XLSX sink: the workbook must be a valid zip of well-formed OOXML
  * parts with the reference's sheet structure (summary with per-variant
  * pivot blocks + data) and indicator color bands (aggregate.py:792-830,
  * 730-747). Also covers the K3 --plot inline-SVG charts.
  */
class XlsxSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmpDir(): Path = Files.createTempDirectory("graft_xlsx")

  private val recipeYaml =
    """input:
      |  path: "%s/*.csv"
      |aggregation: mean
      |values: [Ratio]
      |series: [impl]
      |axis: [func]
      |variants: [arch]
      |indicator:
      |  - column: Ratio
      |    ranges: [0.8, 1.2]
      |    colors: ['#ff0000', '#ffff00', '#00ff00']
      |""".stripMargin

  private def makeBench(): (Benchmark, org.apache.spark.sql.DataFrame) = {
    val dir = tmpDir()
    Files.writeString(dir.resolve("a.csv"),
      """impl, func, arch, Ratio
        |numpy, fft, x86, 0.5
        |numba, fft, x86, 1.0
        |numpy, dot, x86, 1.5
        |numba, dot, x86, 2.5
        |numpy, fft, arm, 1.1
        |""".stripMargin)
    val bench = Benchmark.fromString(spark, recipeYaml.format(dir))
    (bench, bench.getAggregatedData())
  }

  private def entries(path: Path): Map[String, String] = {
    val zf = new ZipFile(path.toFile)
    try zf.entries().asScala.map { e =>
      e.getName -> new String(zf.getInputStream(e).readAllBytes(), "UTF-8")
    }.toMap
    finally zf.close()
  }

  test("workbook structure: parts present, XML well-formed, sheets named") {
    val (bench, df) = makeBench()
    val out = tmpDir().resolve("out.xlsx")
    Sinks.writeXlsx(df, bench.recipe, out.toString)
    val parts = entries(out)
    for (p <- Seq("[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
        "xl/_rels/workbook.xml.rels", "xl/styles.xml",
        "xl/worksheets/sheet1.xml", "xl/worksheets/sheet2.xml"))
      assert(parts.contains(p), s"missing part $p")
    // every part parses as XML
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    for ((name, content) <- parts) {
      val db = dbf.newDocumentBuilder()
      db.parse(new java.io.ByteArrayInputStream(content.getBytes("UTF-8")))
    }
    assert(parts("xl/workbook.xml").contains("""name="summary""""))
    assert(parts("xl/workbook.xml").contains("""name="data""""))
  }

  test("summary sheet carries variant blocks and banded cells") {
    val (bench, df) = makeBench()
    val out = tmpDir().resolve("out.xlsx")
    Sinks.writeXlsx(df, bench.recipe, out.toString)
    val parts = entries(out)
    val summary = parts("xl/worksheets/sheet1.xml")
    // variant header mini-tables for both arch values
    assert(summary.contains("<t xml:space=\"preserve\">arch</t>"))
    assert(summary.contains("<t xml:space=\"preserve\">x86</t>"))
    assert(summary.contains("<t xml:space=\"preserve\">arm</t>"))
    // banded numeric cells reference non-default styles
    assert("""s="[1-9]"""".r.findFirstIn(summary).isDefined)
    // styles carry the indicator colors as solid fills
    val styles = parts("xl/styles.xml")
    for (c <- Seq("FFFF0000", "FFFFFF00", "FF00FF00"))
      assert(styles.contains(c), s"missing fill $c")
    // data sheet has the full aggregated frame (header + 5 rows)
    val data = parts("xl/worksheets/sheet2.xml")
    assert("""<row """.r.findAllIn(data).length == 6)
  }

  test("indicator band selection follows the reference's boundary count") {
    val ic = IndicatorConf("Ratio", Seq(1.2, 0.8), Seq("#r", "#y", "#g"))
    assert(ic.colorOf(0.5) == "#r")   // <= 0.8
    assert(ic.colorOf(0.8) == "#r")   // boundary itself: col > b is false
    assert(ic.colorOf(1.0) == "#y")
    assert(ic.colorOf(2.0) == "#g")
    assert(ic.colorOf(Double.NaN) == "#ffffff")
  }

  test("--raw adds a sheet with the full normalized pre-aggregation frame") {
    val (bench, df) = makeBench()
    val out = tmpDir().resolve("raw.xlsx")
    Sinks.writeXlsx(df, bench.recipe, out.toString,
      raw = Some(bench.getNormalizedData()))
    val parts = entries(out)
    assert(parts("xl/workbook.xml").contains("name=\"raw\""))
    val rawXml = parts("xl/worksheets/sheet3.xml")
    // header + the 5 input rows
    assert("""<row """.r.findAllIn(rawXml).length == 6)
  }

  test("env sheet outer-joins per-env package tables (J5)") {
    val dir = tmpDir()
    // per-env package YAMLs named <ts>_<suite>_env_<env>_packages.yml
    Files.writeString(dir.resolve("0001_suite_env_alpha_packages.yml"),
      """numpy: {name: numpy, version: '1.26', build: py311}
        |mkl: {name: mkl, version: '2024.0', build: intel}
        |""".stripMargin)
    Files.writeString(dir.resolve("0001_suite_env_beta_packages.yml"),
      """numpy: {name: numpy, version: '1.24', build: py310}
        |tbb: {name: tbb, version: '2021.9', build: intel}
        |""".stripMargin)
    Files.writeString(dir.resolve("raw_child.yml"),
      s"""input:
         |  path: "$dir/*.csv"
         |  packages_path: "$dir/*_packages.yml"
         |aggregation: mean
         |values: [Ratio]
         |""".stripMargin)
    Files.writeString(dir.resolve("a.csv"),
      "impl, func, arch, Ratio\nnumpy, fft, x86, 0.5\n")
    val parent = Benchmark.fromString(spark,
      s"""input:
         |  config: ["$dir/raw_child.yml"]
         |aggregation: mean
         |values: [Ratio]
         |series: [impl]
         |axis: [func]
         |variants: [arch]
         |""".stripMargin, dir.toString)
    val out = tmpDir().resolve("env.xlsx")
    Sinks.writeXlsx(parent.getAggregatedData(), parent.recipe, out.toString)
    val parts = entries(out)
    // env is sheet 3
    assert(parts("xl/workbook.xml").contains("name=\"env\""))
    val env = parts("xl/worksheets/sheet3.xml")
    for (s <- Seq("alpha", "beta", "version", "build", "numpy", "mkl", "tbb",
                  "1.26", "2021.9"))
      assert(env.contains(s">$s</t>") || env.contains(s"preserve\">$s</t>"), s"missing $s")
    // outer join: 2 header rows + 3 package rows (numpy, mkl, tbb)
    assert("""<row """.r.findAllIn(env).length == 5)
  }

  test("HTML --plot embeds one SVG grouped bar chart per variant") {
    val (bench, df) = makeBench()
    val html = Sinks.toHtml(df, bench.recipe, "t", plot = true)
    assert("<svg ".r.findAllIn(html).length == 2) // arm + x86 variants
    assert(html.contains("class=\"bar\""))
    val noPlot = Sinks.toHtml(df, bench.recipe, "t")
    assert(!noPlot.contains("<svg"))
  }
}
