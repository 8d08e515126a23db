package graft.recipe

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compiler for the reference's `precomputed` expression strings — the
  * observed Python-lambda idiom set (SURVEY.md §2.2/§7.4) — into Spark
  * `Column`s. NO code evaluation: a hand-rolled tokenizer + recursive-
  * descent parser over the closed grammar; anything outside it fails
  * loudly naming the construct (reference eval's arbitrary Python,
  * bearysta aggregate.py:479-506 — we deliberately do not).
  *
  * `ratio_of` family calls compile to [[RatioCall]] AST nodes which the
  * pipeline replaces with join-computed columns before final compilation
  * (the reference computes them via group-agg + index-aligned merge,
  * aggregate.py:354-442; Spark has no row index so the pipeline uses the
  * equivalent key-join — SURVEY.md §1.1).
  */
object ExprCompiler {

  // ---------- AST ----------
  sealed trait Ast
  case class Lit(v: Any) extends Ast
  case class ColRef(name: String) extends Ast // row['x'] / df['x']
  case class Bin(op: String, l: Ast, r: Ast) extends Ast
  case class Un(op: String, e: Ast) extends Ast
  case class Cmp(op: String, l: Ast, r: Ast) extends Ast
  case class BoolOp(op: String, l: Ast, r: Ast) extends Ast
  case class Ternary(value: Ast, cond: Ast, orelse: Ast) extends Ast
  case class InTuple(e: Ast, items: Seq[Ast], negated: Boolean) extends Ast
  case class Method(recv: Ast, name: String, args: Seq[Ast]) extends Ast
  case class IndexOp(recv: Ast, idx: Ast) extends Ast
  case class SliceOp(recv: Ast, lo: Option[Int], hi: Option[Int]) extends Ast
  case class ListLit(items: Seq[Ast]) extends Ast
  case class FuncCall(name: String, args: Seq[Ast], kwargs: Seq[(String, Ast)]) extends Ast
  case class LambdaInvoke(param: String, body: Ast, arg: Ast) extends Ast
  case class ParamRef(name: String) extends Ast
  /** ratio_of / percent_of family (compiled by the pipeline via joins) */
  case class RatioCall(func: String, column: String, invert: Boolean,
                       seriesKw: Seq[(String, Any)]) extends Ast

  val ratioFuncs: Set[String] = Set(
    "ratio_of", "ratio_of_inv", "ratio_diff", "ratio_diff_inv",
    "percent_of", "percent_of_inv", "percent_diff", "percent_diff_inv")

  case class ExprError(msg: String) extends RuntimeException(msg)

  // ---------- tokenizer ----------
  sealed trait Tok
  case class TNum(v: String) extends Tok
  case class TStr(v: String) extends Tok
  case class TName(v: String) extends Tok
  case class TOp(v: String) extends Tok

  private def tokenize(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val ops2 = Set("==", "!=", "<=", ">=", "//")
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'' || c == '"') {
        val q = c; val sb = new StringBuilder; i += 1
        while (i < s.length && s(i) != q) {
          if (s(i) == '\\' && i + 1 < s.length) { sb.append(s(i + 1)); i += 2 }
          else { sb.append(s(i)); i += 1 }
        }
        if (i >= s.length) throw ExprError(s"unterminated string in: $s")
        i += 1
        out += TStr(sb.toString)
      } else if (c.isDigit || (c == '.' && i + 1 < s.length && s(i + 1).isDigit)) {
        val start = i
        while (i < s.length && (s(i).isDigit || s(i) == '.' || s(i) == 'e' ||
          s(i) == 'E' || ((s(i) == '+' || s(i) == '-') && (s(i - 1) == 'e' || s(i - 1) == 'E')))) i += 1
        out += TNum(s.substring(start, i))
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
        out += TName(s.substring(start, i))
      } else if (i + 1 < s.length && ops2.contains(s.substring(i, i + 2))) {
        out += TOp(s.substring(i, i + 2)); i += 2
      } else {
        out += TOp(c.toString); i += 1
      }
    }
    out.result()
  }

  // ---------- parser ----------
  private class Parser(val toks: Vector[Tok], src: String) {
    var pos = 0
    def peek: Option[Tok] = toks.lift(pos)
    def next(): Tok = { val t = toks.lift(pos).getOrElse(throw ExprError(s"unexpected end of expression: $src")); pos += 1; t }
    def accept(op: String): Boolean = peek match {
      case Some(TOp(`op`)) => pos += 1; true
      case _ => false
    }
    def acceptName(n: String): Boolean = peek match {
      case Some(TName(`n`)) => pos += 1; true
      case _ => false
    }
    def expect(op: String): Unit =
      if (!accept(op)) throw ExprError(s"expected '$op' at token $pos in: $src")

    /** python conditional expression: VALUE if COND else ORELSE */
    def parseExpr(): Ast = {
      val value = parseOr()
      if (acceptName("if")) {
        val cond = parseOr()
        if (!acceptName("else")) throw ExprError(s"ternary missing 'else' in: $src")
        val orelse = parseExpr()
        Ternary(value, cond, orelse)
      } else value
    }

    def parseOr(): Ast = {
      var l = parseAnd()
      while (acceptName("or")) l = BoolOp("or", l, parseAnd())
      l
    }
    def parseAnd(): Ast = {
      var l = parseNot()
      while (acceptName("and")) l = BoolOp("and", l, parseNot())
      l
    }
    def parseNot(): Ast =
      if (acceptName("not")) Un("not", parseNot()) else parseCmp()

    def parseCmp(): Ast = {
      val l = parseAdd()
      peek match {
        case Some(TOp(op)) if Set("==", "!=", "<", "<=", ">", ">=").contains(op) =>
          pos += 1; Cmp(op, l, parseAdd())
        case Some(TName("in")) =>
          pos += 1; InTuple(l, parseTupleOrList(), negated = false)
        case Some(TName("not")) if toks.lift(pos + 1).contains(TName("in")) =>
          pos += 2; InTuple(l, parseTupleOrList(), negated = true)
        case _ => l
      }
    }

    def parseTupleOrList(): Seq[Ast] = {
      val opener = next() match {
        case TOp("(") => ")"
        case TOp("[") => "]"
        case t => throw ExprError(s"expected tuple/list after 'in', got $t in: $src")
      }
      val items = Seq.newBuilder[Ast]
      if (!accept(opener)) {
        items += parseExpr()
        while (accept(",")) if (!peek.contains(TOp(opener))) items += parseExpr()
        expect(opener)
      }
      items.result()
    }

    def parseAdd(): Ast = {
      var l = parseMul()
      var done = false
      while (!done) peek match {
        case Some(TOp(op @ ("+" | "-"))) => pos += 1; l = Bin(op, l, parseMul())
        case _ => done = true
      }
      l
    }
    def parseMul(): Ast = {
      var l = parseUnary()
      var done = false
      while (!done) peek match {
        case Some(TOp(op @ ("*" | "/" | "%"))) => pos += 1; l = Bin(op, l, parseUnary())
        case Some(TOp("//")) => pos += 1; l = Bin("//", l, parseUnary())
        case _ => done = true
      }
      l
    }
    def parseUnary(): Ast = peek match {
      case Some(TOp("-")) => pos += 1; Un("-", parseUnary())
      case _ => parsePostfix()
    }

    def parsePostfix(): Ast = {
      var e = parsePrimary()
      var done = false
      while (!done) peek match {
        case Some(TOp(".")) =>
          pos += 1
          val name = next() match {
            case TName(n) => n
            case t => throw ExprError(s"expected method name after '.', got $t in: $src")
          }
          val args = if (accept("(")) {
            val as = Seq.newBuilder[Ast]
            if (!accept(")")) {
              // `kw=expr` method kwargs (fillna(value='n/a'), sklearn.yml
              // idiom) fold to positional — the observed methods have one
              // arg whose kwarg name adds no information
              def one(): Unit = (peek, toks.lift(pos + 1)) match {
                case (Some(TName(_)), Some(TOp("="))) => pos += 2; as += parseExpr()
                case _ => as += parseExpr()
              }
              one()
              while (accept(",")) one()
              expect(")")
            }
            as.result()
          } else throw ExprError(s"attribute access '.$name' without call is unsupported in: $src")
          e = Method(e, name, args)
        case Some(TOp("[")) =>
          pos += 1
          // string index (column selection on a read_csv_fd frame, S8)
          if (peek.exists(_.isInstanceOf[TStr]) && toks.lift(pos + 1).contains(TOp("]"))) {
            val TStr(s) = peek.get: @unchecked
            pos += 2
            e = IndexOp(e, Lit(s))
          } else {
          // index or slice with integer-literal bounds
          def optInt(): Option[Int] = peek match {
            case Some(TOp(":")) | Some(TOp("]")) => None
            case _ =>
              parseExpr() match {
                case Lit(n: Long) => Some(n.toInt)
                case Un("-", Lit(n: Long)) => Some(-n.toInt)
                case other => return Some(throw ExprError(s"non-literal slice bound $other in: $src"))
              }
          }
          val lo = optInt()
          if (accept(":")) {
            val hi = optInt()
            expect("]")
            e = SliceOp(e, lo, hi)
          } else {
            expect("]")
            e = IndexOp(e, lo.map(n => Lit(n.toLong)).getOrElse(throw ExprError(s"empty index in: $src")))
          }
          }
        case _ => done = true
      }
      e
    }

    def parsePrimary(): Ast = next() match {
      case TNum(n) =>
        if (n.contains('.') || n.toLowerCase.contains('e')) Lit(n.toDouble) else Lit(n.toLong)
      case TStr(s) => Lit(s)
      case TName("True") => Lit(true)
      case TName("False") => Lit(false)
      case TName("None") => Lit(null)
      case TName("row") | TName("df") =>
        expect("["); val c = next() match {
          case TStr(s) => s
          case t => throw ExprError(s"expected column name string, got $t in: $src")
        }; expect("]")
        ColRef(c)
      case TName("lambda") =>
        throw ExprError(s"bare lambda outside immediate invocation in: $src")
      case TName(fn) if peek.contains(TOp("(")) =>
        pos += 1
        val args = Seq.newBuilder[Ast]; val kwargs = Seq.newBuilder[(String, Ast)]
        if (!accept(")")) {
          def one(): Unit = (peek, toks.lift(pos + 1)) match {
            case (Some(TName(k)), Some(TOp("="))) if !toks.lift(pos + 1).contains(TOp("==")) =>
              pos += 2; kwargs += (k -> parseExpr())
            case _ => args += parseExpr()
          }
          one()
          while (accept(",")) one()
          expect(")")
        }
        FuncCall(fn, args.result(), kwargs.result())
      case TName(n) => ParamRef(n) // lambda parameter reference
      case TOp("(") =>
        // grouped expr, tuple, or immediately-invoked lambda
        if (acceptName("lambda")) {
          val param = next() match {
            case TName(p) => p
            case t => throw ExprError(s"expected lambda param, got $t in: $src")
          }
          expect(":")
          val body = parseExpr()
          expect(")")
          expect("(")
          val arg = parseExpr()
          expect(")")
          LambdaInvoke(param, body, arg)
        } else {
          val e = parseExpr()
          expect(")")
          e
        }
      case TOp("[") =>
        val items = Seq.newBuilder[Ast]
        if (!accept("]")) {
          items += parseExpr()
          while (accept(",")) items += parseExpr()
          expect("]")
        }
        ListLit(items.result())
      case t => throw ExprError(s"unexpected token $t in: $src")
    }
  }

  def parse(src: String): Ast = {
    val p = new Parser(tokenize(src), src)
    val ast = p.parseExpr()
    if (p.pos != p.toks.size)
      throw ExprError(s"trailing tokens from position ${p.pos} in: $src")
    resolveRatio(ast)
  }

  /** Rewrites FuncCall nodes of the ratio family into RatioCall. */
  private def resolveRatio(ast: Ast): Ast = mapAst(ast) {
    case FuncCall(fn, args, kwargs) if ratioFuncs.contains(fn) =>
      val column = args match {
        case Seq(Lit(c: String)) => c
        case _ => throw ExprError(s"$fn needs a single literal column arg")
      }
      val invertKw = kwargs.collectFirst { case ("invert", Lit(b: Boolean)) => b }.getOrElse(false)
      val invert = fn.endsWith("_inv") ^ invertKw
      val series = kwargs.filter(_._1 != "invert").map {
        case (k, Lit(v)) => k -> v
        case (k, other) => throw ExprError(s"$fn kwarg $k must be a literal, got $other")
      }
      RatioCall(fn, column, invert, series)
  }

  private def mapAst(ast: Ast)(pf: PartialFunction[Ast, Ast]): Ast = {
    val rec: Ast => Ast = mapAst(_)(pf)
    val walked = ast match {
      case Bin(o, l, r) => Bin(o, rec(l), rec(r))
      case Un(o, e) => Un(o, rec(e))
      case Cmp(o, l, r) => Cmp(o, rec(l), rec(r))
      case BoolOp(o, l, r) => BoolOp(o, rec(l), rec(r))
      case Ternary(v, c, e) => Ternary(rec(v), rec(c), rec(e))
      case InTuple(e, items, n) => InTuple(rec(e), items.map(rec), n)
      case Method(r, n, a) => Method(rec(r), n, a.map(rec))
      case IndexOp(r, i) => IndexOp(rec(r), rec(i))
      case SliceOp(r, lo, hi) => SliceOp(rec(r), lo, hi)
      case ListLit(items) => ListLit(items.map(rec))
      case FuncCall(n, a, k) => FuncCall(n, a.map(rec), k.map { case (kk, v) => kk -> rec(v) })
      case LambdaInvoke(p, b, a) => LambdaInvoke(p, rec(b), rec(a))
      case leaf => leaf
    }
    pf.applyOrElse(walked, identity[Ast])
  }

  // ---------- S8: read_csv_fd side inputs ----------

  /** Marker nodes produced while folding a read_csv_fd subtree into a
    * literal; any that survive [[resolveSideInputs]] are a usage error. */
  private case class SideFrame(path: String) extends Ast
  private case class SideCol(path: String, column: String) extends Ast

  /** Side CSVs are config-sized; cache per absolute path like the
    * reference's read_csv_cached (aggregate.py:287-293). */
  private val sideCsvCache =
    scala.collection.concurrent.TrieMap.empty[String, Array[org.apache.spark.sql.Row]]

  private def sideCsvColumn(spark: org.apache.spark.sql.SparkSession,
                            path: String, column: String): Seq[Any] = {
    val rows = sideCsvCache.getOrElseUpdate(path,
      spark.read.option("header", "true").option("inferSchema", "true")
        .option("ignoreLeadingWhiteSpace", "true").csv(path).collect())
    rows.toSeq.map { r =>
      val i = r.schema.fieldIndex(column)
      if (r.isNullAt(i)) null else r.get(i)
    }
  }

  /** S8 (aggregate.py:287-293, 483): `read_csv_fd('path')` inside a
    * precomputed expression. The reference hands the whole pandas frame
    * to eval; the closed-grammar equivalents here fold to a literal at
    * recipe-compile time (the side CSV is a config file, not data):
    *   read_csv_fd(p)['c'].min()/.max()/.mean()/.sum()/.count()
    *   read_csv_fd(p)['c'][i]          (i: python-style row index)
    * Anything else fails loudly naming the supported forms. */
  def resolveSideInputs(ast: Ast, spark: org.apache.spark.sql.SparkSession,
                        baseDir: String): Ast = {
    def resolve(p: String): String =
      if (new java.io.File(p).isAbsolute) p else new java.io.File(baseDir, p).getPath
    def num(v: Any): Double = v match {
      case n: Number => n.doubleValue()
      case other => throw ExprError(s"read_csv_fd aggregate over non-numeric value $other")
    }
    val folded = mapAst(ast) {
      case FuncCall("read_csv_fd", Seq(Lit(p: String)), _) => SideFrame(resolve(p))
      case IndexOp(SideFrame(p), Lit(c: String)) => SideCol(p, c)
      case Method(SideCol(p, c), agg, Seq()) =>
        val vs = sideCsvColumn(spark, p, c).filter(_ != null) // pandas skipna
        if (vs.isEmpty && agg != "count")
          throw ExprError(s"read_csv_fd('$p')['$c'] has no non-null values")
        Lit(agg match {
          case "min" => vs.map(num).min
          case "max" => vs.map(num).max
          case "mean" => vs.map(num).sum / vs.size
          case "sum" => vs.map(num).sum
          case "count" => vs.size.toLong
          case other =>
            throw ExprError(s"unsupported read_csv_fd aggregate .$other() " +
              "(supported: min, max, mean, sum, count)")
        })
      case IndexOp(SideCol(p, c), Lit(i: Long)) =>
        val vs = sideCsvColumn(spark, p, c)
        val idx = if (i >= 0) i.toInt else vs.size + i.toInt
        if (idx < 0 || idx >= vs.size)
          throw ExprError(s"read_csv_fd('$p')['$c'][$i] out of range (${vs.size} rows)")
        Lit(vs(idx))
    }
    mapAst(folded) {
      case s: SideFrame =>
        throw ExprError("read_csv_fd(...) must be used as read_csv_fd('path')" +
          "['col'].min()/.max()/.mean()/.sum()/.count() or ['col'][i]; got bare frame of " + s.path)
      case s: SideCol =>
        throw ExprError(s"read_csv_fd('${s.path}')['${s.column}'] must end in an " +
          "aggregate (.min/.max/.mean/.sum/.count) or a row index [i]")
    }
  }

  /** Collect ratio calls (pipeline computes them via joins first). */
  def ratioCalls(ast: Ast): Seq[RatioCall] = {
    val buf = Seq.newBuilder[RatioCall]
    mapAst(ast) { case r: RatioCall => buf += r; r }
    buf.result()
  }

  // ---------- compilation to Column ----------

  /** Python truthiness for non-boolean ternary conditions (the recipe
    * idiom `row['Prefix'] if row['Prefix'] else 'Native-C'`,
    * blackscholes.yml): null and '' are falsy. Numeric 0 would be falsy
    * in Python but is truthy here — no observed recipe tests numeric
    * truthiness, and the cast would conflate the string '0'. */
  private def truthy(cond: Ast, go: Ast => Column): Column = cond match {
    case _: Cmp | _: BoolOp | Un("not", _) | _: InTuple | Lit(_: Boolean) =>
      go(cond)
    case other =>
      val c = go(other)
      c.isNotNull && c.cast("string") =!= ""
  }

  /** Cross-type-safe equality (see Cmp("==") note): numeric equality
    * when both sides try_cast to double, string equality otherwise. Null
    * on either side stays null (callers coalesce to the Python
    * missing-data answer).
    *
    * Integral values compare on an exact long path first: a plain
    * double compare would conflate distinct ints beyond 2^53 (Python's
    * int == int is arbitrary-precision). The long path is gated on the
    * long round-tripping through double — try_cast(1.5 as long)
    * TRUNCATES to 1, so without the round-trip guard 1.5 == 1 would be
    * true; with it, any fractional side falls through to the double
    * compare (which is Python's float semantics anyway). */
  private def pyEq(l: Column, r: Column): Column = {
    import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
    val ln = l.try_cast(DoubleType)
    val rn = r.try_cast(DoubleType)
    val li = l.try_cast(LongType)
    val ri = r.try_cast(LongType)
    val bothIntegral = li.isNotNull && ri.isNotNull &&
      li.cast(DoubleType) === ln && ri.cast(DoubleType) === rn
    when(l.isNull || r.isNull, lit(null).cast("boolean"))
      .when(bothIntegral, li === ri)
      .when(ln.isNotNull && rn.isNotNull, ln === rn)
      .otherwise(l.cast(StringType) === r.cast(StringType))
  }

  /** Compile an AST to a Column. `bindings` supplies pre-computed columns
    * for RatioCall nodes (keyed by RatioCall) and lambda params. */
  def compile(ast: Ast,
              ratioBindings: Map[RatioCall, Column] = Map.empty,
              params: Map[String, Column] = Map.empty): Column = {
    def go(a: Ast): Column = a match {
      case Lit(null) => lit(null)
      case Lit(v: Long) => lit(v)
      case Lit(v) => lit(v)
      case ColRef(c) => col(s"`$c`") // quoted: column names may contain dots
      case ParamRef(p) =>
        params.getOrElse(p, throw ExprError(s"unknown name '$p' (not a lambda param; use row['$p']?)"))
      case r: RatioCall =>
        ratioBindings.getOrElse(r, throw ExprError(s"unbound ratio call $r"))
      case Bin("+", l @ (_: SliceOp | _: ListLit | Method(_, "split", _)), r) =>
        concat(go(l), go(r)) // list concatenation
      case Bin("+", l, r @ ListLit(_)) => concat(go(l), go(r))
      case Bin("+", l, r) => go(l) + go(r)
      case Bin("-", l, r) => go(l) - go(r)
      case Bin("*", l, r) => go(l) * go(r)
      case Bin("/", l, r) => go(l) / go(r)
      case Bin("%", l, r) => go(l) % go(r)
      case Bin("//", l, r) => floor(go(l) / go(r)).cast("long")
      case Un("-", e) => -go(e)
      case Un("not", e) => !go(e)
      // Python comparison semantics on missing data: NaN == x is False
      // and NaN != x is True (never null/NaN). SQL's null-propagating
      // =/<> diverges wherever the result is STORED (e.g. the corpus's
      // boolean `drop` precomputes over union-padded columns) — a null
      // drop value would fail `filter-in drop: [false]` that pandas
      // passes.
      //
      // Cross-TYPE equality must also never error: `threads == 'Serial'`
      // over an inference-promoted LONG column would make Spark's ANSI
      // coercion cast 'Serial' to bigint and throw at runtime, where
      // Python just says False. Equality is therefore numeric when both
      // sides parse as numbers (keeping the engine's inference-parity
      // semantics: string '2' == 2 is true, because the reference's
      // to_numeric would have made that column numeric), else a plain
      // string comparison (never a failing cast).
      case Cmp("==", l, r) => coalesce(pyEq(go(l), go(r)), lit(false))
      case Cmp("!=", l, r) => coalesce(!pyEq(go(l), go(r)), lit(true))
      case Cmp("<", l, r) => go(l) < go(r)
      case Cmp("<=", l, r) => go(l) <= go(r)
      case Cmp(">", l, r) => go(l) > go(r)
      case Cmp(">=", l, r) => go(l) >= go(r)
      case BoolOp("and", l, r) => go(l) && go(r)
      case BoolOp("or", l, r) => go(l) || go(r)
      case Ternary(v, c, e) => when(truthy(c, go), go(v)).otherwise(go(e))
      case InTuple(e, items, neg) =>
        val vals = items.map {
          case Lit(v) => v
          case other => throw ExprError(s"'in' items must be literals, got $other")
        }
        val res = go(e).isin(vals: _*)
        if (neg) !res else res
      case ListLit(items) => array(items.map(go): _*)
      case IndexOp(recv, Lit(i: Long)) =>
        // python 0-based; negative = from end. element_at: 1-based, negative from end.
        if (i >= 0) element_at(go(recv), i.toInt + 1) else element_at(go(recv), i.toInt)
      case IndexOp(_, Lit(s: String)) =>
        throw ExprError(s"string index ['$s'] is only supported on read_csv_fd(...) frames")
      case IndexOp(_, idx) => throw ExprError(s"non-literal index $idx")
      case SliceOp(recv, lo, hi) =>
        val arr = go(recv)
        val n = size(arr)
        def bound(b: Int): Column = if (b >= 0) lit(b) else n + b
        val start0 = lo.map(bound).getOrElse(lit(0))
        val stop0 = hi.map(bound).getOrElse(n)
        val start = greatest(least(start0, n), lit(0))
        val stop = greatest(least(stop0, n), lit(0))
        val len = greatest(stop - start, lit(0))
        when(len === 0, array().cast("array<string>"))
          .otherwise(slice(arr, start + 1, len))
      case Method(recv, "split", args) =>
        val sep = args match {
          case Seq(Lit(s: String)) => java.util.regex.Pattern.quote(s)
          case Seq() => "\\s+"
          case other => throw ExprError(s"unsupported split args $other")
        }
        split(go(recv), sep)
      case Method(recv, "capitalize", Seq()) =>
        val c = go(recv)
        concat(upper(substring(c, 1, 1)), lower(substring(c, 2, Int.MaxValue)))
      case Method(recv, "upper", Seq()) => upper(go(recv))
      case Method(recv, "lower", Seq()) => lower(go(recv))
      case Method(recv, "strip", Seq()) => trim(go(recv))
      case Method(recv, "fillna", Seq(arg)) => arg match {
        // pandas fillna(str) on a numeric column yields a mixed object
        // column (numbers render via str()); Spark's coalesce would
        // instead coerce the STRING FILL to the numeric type (-> null,
        // silently losing the fill). Cast the receiver to string so the
        // fill survives and numbers render like pandas str().
        case Lit(_: String) => coalesce(go(recv).cast("string"), go(arg))
        case _ => coalesce(go(recv), go(arg))
      }
      case Method(Lit(fmt: String), "format", args) =>
        val parts = fmt.split("\\{\\}", -1)
        if (parts.length != args.length + 1)
          throw ExprError(s"format placeholders don't match args in '$fmt'")
        val cols = Seq.newBuilder[Column]
        for (i <- args.indices) {
          if (parts(i).nonEmpty) cols += lit(parts(i))
          cols += go(args(i)).cast("string")
        }
        if (parts.last.nonEmpty) cols += lit(parts.last)
        concat(cols.result(): _*)
      case Method(recv, "astype", Seq(Lit(t: String))) =>
        go(recv).cast(t match {
          case "float64" | "float" => "double"
          case "int64" | "int" => "long"
          case "str" => "string"
          case other => other
        })
      // numpy namespace calls (sklearn.yml precompute idiom): element-wise
      // max/min over column-or-scalar operands
      case Method(ParamRef("np"), "max" | "maximum", args) if args.size >= 2 =>
        greatest(args.map(go): _*)
      case Method(ParamRef("np"), "min" | "minimum", args) if args.size >= 2 =>
        least(args.map(go): _*)
      case Method(ParamRef("np"), "abs", Seq(a)) => abs(go(a))
      case Method(ParamRef("np"), "sqrt", Seq(a)) => sqrt(go(a))
      case Method(ParamRef("np"), "log", Seq(a)) => log(go(a))
      case Method(ParamRef("np"), "exp", Seq(a)) => exp(go(a))
      case Method(_, m, _) => throw ExprError(s"unsupported method .$m")
      case FuncCall("int", Seq(a), _) => go(a).cast("long")
      case FuncCall("float", Seq(a), _) => go(a).cast("double")
      case FuncCall("str", Seq(a), _) => go(a).cast("string")
      case FuncCall("abs", Seq(a), _) => abs(go(a))
      case FuncCall("len", Seq(a), _) => a match {
        // Python len() of a list → element count; of a string → chars.
        // Dispatch on operand shape: split/slice/list-literal/list-concat
        // receivers are arrays, where Spark length() would fail analysis.
        case _: SliceOp | _: ListLit | Method(_, "split", _) |
             Bin("+", _: SliceOp | _: ListLit | Method(_, "split", _), _) =>
          size(go(a)).cast("long")
        case _ => length(go(a)).cast("long")
      }
      case FuncCall(fn, _, _) => throw ExprError(s"unsupported function $fn(...)")
      case LambdaInvoke(param, body, arg) =>
        compile(body, ratioBindings, params + (param -> go(arg)))
      case other => throw ExprError(s"cannot compile $other")
    }
    go(ast)
  }
}
