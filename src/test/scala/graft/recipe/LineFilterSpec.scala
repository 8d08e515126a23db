package graft.recipe

import org.scalatest.funsuite.AnyFunSuite

/** S2 semantics (bearysta aggregate.py:184-243): ordered rules,
  * replace/keep/drop/append actions, implicit empty-line drop, unmatched
  * lines dropped. */
class LineFilterSpec extends AnyFunSuite {

  private def run(filters: Seq[(String, LineAction)], lines: Seq[String]): Seq[String] =
    LineFilter(LineFilter.compile(filters), lines.iterator).toSeq

  test("unmatched lines are dropped; keep (null) passes verbatim") {
    val out = run(Seq("^DATA," -> LineAction.Keep), Seq("DATA,1,2", "noise", "DATA,3,4"))
    assert(out == Seq("DATA,1,2", "DATA,3,4"))
  }

  test("empty lines implicitly dropped") {
    val out = run(Seq(".*" -> LineAction.Keep), Seq("a", "", "   ", "b"))
    assert(out == Seq("a", "b"))
  }

  test("replace rewrites via regex sub with backrefs, all occurrences") {
    val out = run(Seq("(\\w+)=(\\d+)" -> LineAction.Replace("\\1,\\2")),
      Seq("x=1 y=2", "skip me"))
    assert(out == Seq("x,1 y,2"))
  }

  test("drop action deletes matching lines even if a later rule would keep") {
    val out = run(
      Seq("^#" -> LineAction.Drop, "." -> LineAction.Keep),
      Seq("# comment", "data"))
    assert(out == Seq("data"))
  }

  test("append glues onto previous line and a later replace can emit it") {
    // mimics multi-line log records: continuation lines start with space
    val out = run(
      Seq(
        "^cont:" -> LineAction.Append,
        "^full: (.*)$" -> LineAction.Replace("$1")),
      Seq("partial one", "cont: two"))
    // "cont: two" appended to "partial one" -> "partial one cont: two";
    // no later rule matches the merged line -> stays dropped
    assert(out == Seq())

    val out2 = run(
      Seq(
        "^cont: " -> LineAction.Append,
        "one.*two" -> LineAction.Keep),
      Seq("partial one", "cont: two"))
    // merged line keeps the matched "cont: " text (reference glues
    // prev.rstrip + ' ' + line.lstrip verbatim) and matches the keep rule
    assert(out2 == Seq("partial one cont: two"))
  }

  test("replacements chain across rules in order") {
    val out = run(
      Seq("a" -> LineAction.Replace("b"), "b" -> LineAction.Replace("c")),
      Seq("aaa"))
    assert(out == Seq("ccc"))
  }

  test("python \\g<n> backrefs translate") {
    assert(LineFilter.javaRepl("\\g<1>x") == "${1}x")
    assert(LineFilter.javaRepl("\\1,\\2") == "$1,$2")
    assert(LineFilter.javaRepl("cost $5") == "cost \\$5")
  }
}
