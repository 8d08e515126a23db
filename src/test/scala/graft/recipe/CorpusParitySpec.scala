package graft.recipe

import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Verbatim-parity check for the recipe corpus: every yml the fixture
  * tree ships must be SEMANTICALLY IDENTICAL (YAML-parse equality, which
  * ignores comments and whitespace style) to its counterpart under the
  * reference's examples/aggregations tree. This is the machine-checked
  * form of the "28/28 recipes run verbatim" claim — a child-list
  * reduction, a dropped filter block, or a missing number-format shows
  * up here as a structural diff, not a prose caveat. */
class CorpusParitySpec extends AnyFunSuite {

  private val refRoot = new java.io.File("/root/reference/examples/aggregations")

  /** Normalize a parsed YAML tree for comparison: java maps/lists to
    * Scala, numbers by double value (2 == 2.0), everything else by
    * String.valueOf. */
  private def norm(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.toSeq.map { case (k, x) => String.valueOf(k) -> norm(x) }
    case l: java.util.List[_] => l.asScala.toList.map(norm)
    case n: java.lang.Number => n.doubleValue()
    case null => null
    case other => String.valueOf(other)
  }

  test("all 28 fixture recipes YAML-parse-equal their reference files") {
    assume(refRoot.isDirectory, "reference corpus not present")
    val yaml = new org.yaml.snakeyaml.Yaml()
    val fails = scala.collection.mutable.ArrayBuffer.empty[String]
    val ymls = graft.corpus.ReferenceCorpus.recipeFiles.filter(_._1.endsWith(".yml"))
    assert(ymls.size == 28, s"expected 28 recipes, corpus ships ${ymls.size}")
    for ((rel, text) <- ymls) {
      val refFile = new java.io.File(refRoot, rel)
      assert(refFile.isFile, s"$rel has no reference counterpart")
      val ours = norm(yaml.load[Object](text))
      val ref = norm(yaml.load[Object](
        new String(java.nio.file.Files.readAllBytes(refFile.toPath), "UTF-8")))
      if (ours != ref) fails += s"$rel differs:\n  ours=$ours\n  ref =$ref"
    }
    assert(fails.isEmpty, fails.mkString("\n"))
  }

  test("fixture targets.csv column header matches the reference") {
    assume(refRoot.isDirectory, "reference corpus not present")
    val ref = scala.io.Source.fromFile(new java.io.File(refRoot, "targets.csv"))
    val refHeader = try ref.getLines().next() finally ref.close()
    val ourHeader = graft.corpus.CorpusRecipes.targetsCsv.linesIterator.next()
    assert(ourHeader == refHeader)
  }
}
