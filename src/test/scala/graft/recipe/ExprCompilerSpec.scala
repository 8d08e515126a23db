package graft.recipe

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The precomputed-DSL idiom set from SURVEY §2.2, compiled and evaluated
  * on a tiny frame. */
class ExprCompilerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import ExprCompiler._

  private def eval(expr: String, rows: Seq[(String, Long, Double)] =
      Seq(("native_c/runs/x", 1L, 10.0), ("intelpython/runs/y", 4L, 2.5))): Seq[Any] = {
    import spark.implicits._
    val df = rows.toDF("Directory", "Threads", "Time")
    df.select(compile(parse(expr)).as("r")).collect().map(r => r.get(0)).toSeq
  }

  test("string literal constant") {
    assert(eval("'FFT'") == Seq("FFT", "FFT"))
  }

  test("conditional: 'Serial' if row['Threads'] == 1 else 'Parallel'") {
    assert(eval("'Serial' if row['Threads'] == 1 else 'Parallel'") ==
      Seq("Serial", "Parallel"))
  }

  test("path split + index with negatives") {
    assert(eval("row['Directory'].split('/')[-1]") == Seq("x", "y"))
    assert(eval("row['Directory'].split('/')[0]") == Seq("native_c", "intelpython"))
  }

  test("split + slice + list concat default (blackscholes idiom)") {
    // slice beyond range -> empty -> concat default gives ['Unknown'][0]
    assert(eval("(row['Directory'].split('/')[-9:-8]+['Unknown'])[0]") ==
      Seq("Unknown", "Unknown"))
    assert(eval("(row['Directory'].split('/')[0:1]+['Unknown'])[0]") ==
      Seq("native_c", "intelpython"))
  }

  test("format string (df_clsf idiom)") {
    assert(eval("'{}x{}'.format(row['Threads'], row['Threads'])") ==
      Seq("1x1", "4x4"))
  }

  test("tuple membership and boolean or") {
    assert(eval("row['Threads'] in (1, 2) or row['Time'] > 5") ==
      Seq(true, false))
  }

  test("arithmetic and comparison") {
    assert(eval("1 / (row['Time'] / 10)") == Seq(1.0, 4.0))
    assert(eval("row['Threads'] != 1") == Seq(false, true))
  }

  test("capitalize matches python semantics (not initcap)") {
    import spark.implicits._
    val df = Seq("hello WORLD").toDF("s")
    val out = df.select(compile(parse("row['s'].capitalize()"))).head.getString(0)
    assert(out == "Hello world")
  }

  test("fillna -> coalesce") {
    import spark.implicits._
    val df = Seq((Some("a"), 1), (None, 2)).toDF("c", "i")
    val out = df.select(compile(parse("df['c'].fillna('n/a')"))).collect().map(_.getString(0))
    assert(out.toSeq == Seq("a", "n/a"))
  }

  test("int() cast truncates") {
    assert(eval("int(row['Time'])") == Seq(10L, 2L))
  }

  test("immediately-invoked lambda (fft idiom)") {
    assert(eval("(lambda p: 'Native-C' if p == 'native_c' else p)(row['Directory'].split('/')[0])") ==
      Seq("Native-C", "intelpython"))
  }

  test("method kwargs fold to positional (fillna(value=...), sklearn idiom)") {
    import spark.implicits._
    val df = Seq(Some("a"), None).toDF("c")
    val out = df.select(compile(parse("df['c'].fillna(value='n/a')")))
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("a", "n/a"))
  }

  test("np.max / np.minimum compile to greatest/least (sklearn precompute)") {
    assert(eval("np.max(row['Time'], 5.0)") == Seq(10.0, 5.0))
    assert(eval("np.minimum(row['Time'], 5.0)") == Seq(5.0, 2.5))
    assert(eval("np.sqrt(np.abs(0.0 - row['Threads'] * row['Threads']))") ==
      Seq(1.0, 4.0))
  }

  test("ratio_of family parses into RatioCall with kwargs") {
    val ast = parse("1 / ratio_of('Time', Prefix='native')")
    val calls = ratioCalls(ast)
    assert(calls == Seq(RatioCall("ratio_of", "Time", invert = false, Seq("Prefix" -> "native"))))
  }

  test("len() dispatches on operand shape: list -> size, string -> length") {
    assert(eval("len(row['Directory'].split('/'))") == Seq(3L, 3L))
    assert(eval("len(row['Directory'].split('/')[0:2])") == Seq(2L, 2L))
    assert(eval("len(row['Directory'])") == Seq("native_c/runs/x".length.toLong,
      "intelpython/runs/y".length.toLong))
  }

  test("== / != on missing data follow Python, not SQL: never null") {
    import spark.implicits._
    val df = Seq((Some(2L), "a"), (None, "b")).toDF("Classes", "Prefix")
    val out = df.select(
      compile(parse("row['Classes'] == 2")).as("eq"),
      compile(parse("row['Classes'] != 2")).as("ne"),
      compile(parse("row['Prefix'] == 'daal4py' or row['Classes'] == 2")).as("orcase"))
      .collect().map(r => (r.get(0), r.get(1), r.get(2))).toSeq
    // pandas: NaN == 2 -> False, NaN != 2 -> True (no null booleans)
    assert(out == Seq((true, false, true), (false, true, false)))
  }

  test("== / != across types never throw and follow inference-parity semantics") {
    import spark.implicits._
    // a LONG column compared against a string: Python says False, ANSI
    // Spark would throw CAST_INVALID_INPUT casting 'Serial' to bigint
    val longs = Seq(1L, 16L).toDF("threads")
    val a = longs.select(
      compile(parse("row['threads'] == 'Serial'")).as("eqs"),
      compile(parse("row['threads'] != 'Serial'")).as("nes"),
      compile(parse("row['threads'] == 1")).as("eq1"))
      .collect().map(r => (r.get(0), r.get(1), r.get(2))).toSeq
    assert(a == Seq((false, true, true), (false, true, false)))
    // a STRING column with mixed values against a number: numeric
    // equality where both sides parse (inference parity: the reference's
    // to_numeric would have promoted an all-numeric column, so '2' == 2),
    // plain False where the cell is non-numeric
    val strs = Seq("Serial", "16", "2").toDF("threads")
    val b = strs.select(
      compile(parse("row['threads'] == 16")).as("eq16"),
      compile(parse("row['threads'] == 'Serial'")).as("eqser"))
      .collect().map(r => (r.get(0), r.get(1))).toSeq
    assert(b == Seq((false, true), (true, false), (false, false)))
    // the df_regr Mode idiom end-to-end: string-or-numeric disjunct
    val c = strs.select(compile(parse(
      "'Serial' if row['threads'] == 'Serial' or row['threads'] == 1 else 'Parallel'")).as("m"))
      .collect().map(_.getString(0)).toSeq
    assert(c == Seq("Serial", "Parallel", "Parallel"))
  }

  test("== on integers is exact beyond 2^53 (no double conflation)") {
    import spark.implicits._
    // 2^53 and 2^53+1 round to the SAME double; Python int == int is
    // arbitrary-precision, so they must compare unequal — and a
    // fractional side must NOT ride the exact-long path (try_cast
    // truncates 1.5 -> 1, which would make 1.5 == 1 true)
    val big = Seq(9007199254740992L, 9007199254740993L).toDF("id")
    val a = big.select(
      compile(parse("row['id'] == 9007199254740993")).as("eq"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(a == Seq(false, true))
    val fracs = Seq(1.5, 1.0).toDF("x")
    val b = fracs.select(
      compile(parse("row['x'] == 1")).as("eq1"),
      compile(parse("row['x'] == 1.5")).as("eqh"))
      .collect().map(r => (r.get(0), r.get(1))).toSeq
    assert(b == Seq((false, true), (true, false)))
  }

  test("unsupported constructs fail loudly") {
    assertThrows[ExprError](compile(parse("__import__('os')")))
    assertThrows[ExprError](compile(parse("row['x'].unknown_method()")))
    assertThrows[ExprError](compile(parse("open('/etc/passwd')")))
    assertThrows[ExprError](parse("row['x'; DROP"))
  }
}
