package graft.recipe

import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Closure check over the reference's OWN query corpus: every
  * `precomputed` expression in every recipe under the reference's
  * examples/aggregations tree must parse with ExprCompiler — §2.8's
  * scalar-function grammar is defined by exactly this observed set, so
  * a parse failure here is a coverage gap, not a test artifact.
  * (Resolution/execution needs each recipe's data; parsing is the
  * grammar-closure property.) */
class ReferenceExprClosureSpec extends AnyFunSuite {

  private val root = new java.io.File("/root/reference/examples/aggregations")

  private def ymlFiles(dir: java.io.File): Seq[java.io.File] =
    Option(dir.listFiles()).toSeq.flatten.flatMap { f =>
      if (f.isDirectory) ymlFiles(f)
      else if (f.getName.endsWith(".yml")) Seq(f) else Seq.empty
    }

  test("every precomputed expression in the reference corpus parses") {
    assume(root.isDirectory, "reference corpus not present")
    val yaml = new org.yaml.snakeyaml.Yaml()
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    var total = 0
    for (f <- ymlFiles(root)) {
      val loaded =
        try yaml.load[Object](new java.io.FileInputStream(f))
        catch { case _: Exception => null }
      loaded match {
        case m: java.util.Map[_, _] =>
          m.asInstanceOf[java.util.Map[String, Object]].asScala.get("precomputed") match {
            case Some(pm: java.util.Map[_, _]) =>
              for ((k, v) <- pm.asScala.toSeq) {
                total += 1
                // parse AND compile: compile is where an unsupported
                // function/idiom would surface (column resolution is
                // deferred to analysis, so no schema is needed; ratio
                // calls get dummy bindings like the engine provides)
                try {
                  val ast = ExprCompiler.parse(String.valueOf(v))
                  val bindings = ExprCompiler.ratioCalls(ast)
                    .map(_ -> org.apache.spark.sql.functions.lit(1.0)).toMap
                  ExprCompiler.compile(ast, bindings)
                } catch {
                  case e: Exception =>
                    failures += s"${f.getName} / $k: ${String.valueOf(v)} -> ${e.getMessage}"
                }
              }
            case _ => ()
          }
        case _ => ()
      }
    }
    assert(total > 40, s"expected the full corpus, saw only $total expressions")
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("every reference recipe loads as a Recipe and its filter rules compile") {
    assume(root.isDirectory, "reference corpus not present")
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    var total = 0
    for (f <- ymlFiles(root)) {
      total += 1
      try {
        val r = Recipe.load(f.getPath)
        LineFilter.compile(r.input.filters)
      } catch {
        case e: Exception => failures += s"${f.getName}: ${e.getMessage}"
      }
    }
    assert(total >= 28, s"expected the full corpus, saw only $total recipes")
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
