package graft.recipe

import org.scalatest.funsuite.AnyFunSuite

/** Argv-parsing contract of [[RecipeCli]] vs the reference's argparse
  * surface (aggregate.py:968-996): optional-value flags (`nargs='?'` +
  * `const`), counted `-v`, choice validation, and error (not misparse)
  * on malformed input. */
class RecipeCliSpec extends AnyFunSuite {

  private def ok(args: String*): RecipeCli.Config =
    RecipeCli.parse(args.toArray).fold(
      e => fail(s"expected parse success, got error: $e"), identity)

  private def err(args: String*): String =
    RecipeCli.parse(args.toArray).fold(
      identity, c => fail(s"expected parse error, got $c"))

  test("bare -x before the recipe defaults to {filename}.xlsx and keeps the recipe") {
    val c = ok("-x", "recipe.yml")
    assert(c.excel === Some("{filename}.xlsx"))
    assert(c.recipes === List("recipe.yml"))
  }

  test("recipe-then-flag order: bare trailing flags use their consts") {
    val c = ok("recipe.yml", "-x", "-o", "-P", "-H")
    assert(c.excel === Some("{filename}.xlsx"))
    assert(c.csv === Some("{filename}.csv"))
    assert(c.pretty === Some("-"))
    assert(c.html === Some("{filename}.html"))
    assert(c.recipes === List("recipe.yml"))
  }

  test("explicit flag values are consumed; recipes keep CLI order") {
    val c = ok("-x", "out.xlsx", "-o", "res.csv", "a.yml", "b.yaml")
    assert(c.excel === Some("out.xlsx"))
    assert(c.csv === Some("res.csv"))
    assert(c.recipes === List("a.yml", "b.yaml"))
  }

  test("'-' is a valid explicit value (stdout) for -o and -P") {
    val c = ok("-o", "-", "-P", "-", "r.yml")
    assert(c.csv === Some("-"))
    assert(c.pretty === Some("-"))
  }

  test("a flag immediately after a bare optional-value flag is not eaten") {
    val c = ok("-o", "--plot", "r.yml")
    assert(c.csv === Some("{filename}.csv"))
    assert(c.plot)
  }

  test("-v counts: repeated and collapsed forms") {
    assert(ok("-v", "r.yml").verbose === 1)
    assert(ok("-v", "-v", "r.yml").verbose === 2)
    assert(ok("-vvv", "r.yml").verbose === 3)
    assert(ok("--verbose", "--verbose", "r.yml").verbose === 2)
    assert(ok("r.yml").verbose === 0)
  }

  test("--excel-pivot-table validates its choices") {
    assert(ok("-p", "pandas", "r.yml").pivotStyle === "pandas")
    assert(ok("-p", "excel", "r.yml").pivotStyle === "excel")
    assert(err("-p", "com", "r.yml").contains("invalid choice"))
    assert(err("r.yml", "-p").contains("expected one argument"))
  }

  test("--input collects repeats in order and requires a value") {
    val c = ok("-i", "g1/*.csv", "-i", "g2/*.csv", "r.yml")
    assert(c.inputs === List("g1/*.csv", "g2/*.csv"))
    assert(err("r.yml", "-i").contains("expected one argument"))
  }

  test("required-argument options reject a flag-shaped next token (argparse parity)") {
    // argparse: `-i --plot` is "expected one argument" (exit 2), never
    // inputs=["--plot"] with --plot silently dropped
    assert(err("-i", "--plot", "r.yml").contains("expected one argument"))
    assert(err("-p", "-x", "r.yml").contains("expected one argument"))
    // lone "-" stays a legal value position for -i (it is not option-shaped)
    assert(ok("-i", "-", "r.yml").inputs === List("-"))
  }

  test("unknown flags and missing recipes are errors, not recipes") {
    assert(err("--bogus", "r.yml").contains("unrecognized"))
    assert(err("-x").contains("required"))
    assert(err().contains("required"))
  }
}
