package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Cosine similarity of two float-vector columns, computed in double
  * precision with a single fused loop.
  *
  * Native `Expression` with whole-stage codegen: the higher-order-function
  * formulation (`zip_with` + `aggregate`) is evaluated interpreted, one
  * lambda call per element — ~30 µs/vector-pair; this codegen'd loop is
  * ~100× faster and keeps the surrounding operator inside
  * WholeStageCodegen. Accumulation order is the same sequential left-fold,
  * so results are bit-identical to the HOF version (and to a SQL
  * `list_reduce` mirror).
  */
case class ArrayCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0, $na = 0.0, $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xv = (double) $a.getFloat($i);
          double $yv = (double) $b.getFloat($i);
          $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
        }
        ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared Euclidean (L2²) distance of two float-vector columns, double
  * precision, one fused codegen loop — the quantization metric of the
  * product-quantization path ([[graft.operators.Similarity]] PQ): cosine
  * is the right *ranking* metric for full vectors, but per-subspace
  * codebooks must minimize reconstruction error, which is L2.
  * Accumulation is the same sequential left-fold as [[ArrayCosine]], so
  * the value is bit-identical to a `list_reduce` SQL mirror. */
case class ArrayL2Sq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_l2sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
          $acc += $d * $d;
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 32-bit SimHash over a token array: md5 each token, take the top 32
  * bits (== `('0x' || substr(md5(t),1,8))::BIGINT`), then per-bit
  * majority vote (+1/-1, set on >= 0).
  *
  * One native pass replaces an interpreted 32-lambda × n-token expression
  * tree. Whole-stage codegen via an instance reference: the generated
  * code hands the already-computed token array straight to `compute`
  * (the old CodegenFallback form re-evaluated the child interpreted
  * per row — measured 40% of the scan cost on q19's sibling census).
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash32"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash32", this, classOf[SimHash32].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  def compute(arr: ArrayData): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val votes = new Array[Int](32)
    val n = arr.numElements()
    var t = 0
    while (t < n) {
      val d = md.digest(arr.getUTF8String(t).getBytes) // resets digest
      // first 8 hex chars == first 4 bytes, big-endian, unsigned
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var b = 0
      while (b < 32) {
        if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 60-bit SimHash over a token array — the wide variant for large
  * corpora, where 32-bit simhash saturates (at ~10^5+ documents, chance
  * Hamming<=3 collisions of 32-bit sketches dominate true near-dups;
  * P(collision) falls by 2^-28 moving to 60 bits). Per token the hash is
  * the first 15 md5 hex digits (== [[graft.operators.TextAnalysis.hash60]],
  * so the ANSI-SQL mirror is exact); 60 bits = 6 bands x 10 bits for the
  * pigeonhole multi-index. */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash60"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash60", this, classOf[SimHash60].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  def compute(arr: ArrayData): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val votes = new Array[Int](60)
    val n = arr.numElements()
    var t = 0
    while (t < n) {
      val d = md.digest(arr.getUTF8String(t).getBytes) // resets digest
      // first 15 hex chars == top 60 bits of the first 8 bytes
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      h = h >>> 4
      var b = 0
      while (b < 60) {
        if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** k-function affine MinHash over a pre-hashed shingle array
  * (`array<bigint>`): sig_j = min over hashes of (a_j*h + b_j) mod p with
  * a_j = 2j+1, b_j = 7919j + 104729, p = 2^31-1 — identical to the
  * column/SQL formulation, one native pass instead of k interpreted
  * lambda sweeps. */
case class AffineMinHash(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  private val P = 2147483647L

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhash", this, classOf[AffineMinHash].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      if ($c.numElements() == 0) { ${ev.isNull} = true; }
      else { ${ev.value} = $ref.compute($c); }""")
  }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    if (hs.numElements() == 0) null else compute(hs)
  }

  def compute(hs: ArrayData): ArrayData = {
    val n = hs.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < k) {
        val v = ((2L * j + 1L) * h + (7919L * j + 104729L)) % P
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Jaccard similarity of two SORTED distinct long arrays via a single
  * zero-allocation merge: |a ∩ b| counted by two-pointer sweep,
  * |a ∪ b| = |a| + |b| - |a ∩ b| (inputs are distinct sets). ~10× faster
  * than `array_intersect` + `array_union`, which build hash tables and
  * output arrays per pair. Value identical to the set formulation. */
case class SortedLongJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard_sorted"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jaccard", this, classOf[SortedLongJaccard].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  def compute(x: ArrayData, y: ArrayData): Double = {
    val n = x.numElements(); val m = y.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { inter += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    val union = n + m - inter
    if (union == 0) 0.0 else inter.toDouble / union.toDouble
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH sign bucket of a float vector: bit p of the
  * result = (dot(vec, plane_p) >= 0), planes derived deterministically
  * from md5("p,d") low bits (+1/-1). The sign matrix is computed once per
  * (dims) and cached — the column formulation re-derives 8×dims md5
  * hashes per ROW, which dominates everything. Accumulation order matches
  * the sequential left-fold of the column/SQL mirror exactly. */
case class SignBucket(child: Expression, planes: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_signbucket"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("signbucket", this, classOf[SignBucket].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Array[Double]]]()

  private def signMatrix(dims: Int): Array[Array[Double]] =
    cache.computeIfAbsent(dims, _ => {
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(planes, dims) { (p, d) =>
        val dig = md.digest(s"$p,$d".getBytes("UTF-8"))
        val h = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
          ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
        if (h % 2 == 0) 1.0 else -1.0
      }
    })

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  def compute(v: ArrayData): Long = {
    val n = v.numElements()
    val signs = signMatrix(n)
    var bucket = 0L
    var p = 0
    while (p < planes) {
      val row = signs(p)
      var dot = 0.0
      var d = 0
      while (d < n) { dot += v.getFloat(d).toDouble * row(d); d += 1 }
      if (dot >= 0) bucket += (1L << p)
      p += 1
    }
    bucket
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Numeric-class of a string value, for type inference:
  * 1 = integral (`[+-]?[0-9]+` after trim), 2 = double-castable but not
  * integral, 3 = not castable. Double-castability is EXACTLY Spark's
  * string->double cast (Java `Double.parseDouble` after trim, plus the
  * case-insensitive special literals inf/infinity/nan) — but WITHOUT
  * throwing/catching a `NumberFormatException` per non-numeric value,
  * which is what makes `try_cast(double)` cost ~2 µs on text columns: a
  * byte sweep classifies pure-text values directly, and only strings that
  * contain a digit yet still aren't parseable (e.g. "12ab3") ever reach
  * the exception path. Whole-stage codegen via a static helper call, so
  * inference aggregates stay in one codegen stage. */
case class StringNumClass(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_numclass"

  override def nullSafeEval(input: Any): Any =
    StringNumClass.classify(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.StringNumClass.classify($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StringNumClass {
  val INTEGRAL = 1
  val DOUBLE = 2
  val NONE = 3

  /** Static so generated code can call it without holding the expression.
    * Trim matches `String.trim`/`parseDouble` (chars <= U+0020); multibyte
    * UTF-8 units are >= 0x80 and never trimmed.
    *
    * Allocation-free on the three common shapes (the inference aggregate
    * calls this once per cell of every candidate column, so per-call
    * allocations dominate its executor CPU): bytes are read through
    * `UTF8String.getByte` (no defensive array copy), standard decimal/
    * scientific notation is accepted by a pure-byte scanner recognizing a
    * strict SUBSET of `Double.parseDouble`'s language (so a fast-path
    * accept can never disagree with the parser), and no-digit text values
    * only reach the special-literal comparison when their first byte is
    * one of `nNiI+-`. Only exotic-but-parseable forms ("0x1p1", "1.5f")
    * and digit-containing garbage fall through to the String +
    * parseDouble path. */
  def classify(s: org.apache.spark.unsafe.types.UTF8String): Int = {
    var i = 0
    var end = s.numBytes
    while (i < end && (s.getByte(i) & 0xff) <= ' ') i += 1
    while (end > i && (s.getByte(end - 1) & 0xff) <= ' ') end -= 1
    if (i >= end) return NONE // empty/whitespace: parseDouble throws
    // integral fast path: [+-]?[0-9]+
    val j = if (s.getByte(i) == '+' || s.getByte(i) == '-') i + 1 else i
    if (j < end) {
      var allDigits = true
      var k = j
      while (k < end && allDigits) {
        val c = s.getByte(k)
        if (c < '0' || c > '9') allDigits = false
        k += 1
      }
      if (allDigits) return INTEGRAL
    }
    // double fast path: [+-]? (digits [. digits*] | . digits+) ([eE][+-]?digits+)?
    // — a strict subset of parseDouble's language, so accepting here can
    // never disagree with the exception-path verdict below
    var k = j
    var intDigits = 0
    while (k < end && { val c = s.getByte(k); c >= '0' && c <= '9' }) { intDigits += 1; k += 1 }
    var fracDigits = 0
    if (k < end && s.getByte(k) == '.') {
      k += 1
      while (k < end && { val c = s.getByte(k); c >= '0' && c <= '9' }) { fracDigits += 1; k += 1 }
    }
    if (intDigits + fracDigits > 0) {
      var expOk = true
      if (k < end && (s.getByte(k) == 'e' || s.getByte(k) == 'E')) {
        k += 1
        if (k < end && (s.getByte(k) == '+' || s.getByte(k) == '-')) k += 1
        expOk = false // need at least one exponent digit
        while (k < end && { val c = s.getByte(k); c >= '0' && c <= '9' }) { expOk = true; k += 1 }
      }
      if (expOk && k == end) return DOUBLE
    }
    var hasDigit = intDigits + fracDigits > 0
    k = i
    while (k < end && !hasDigit) {
      val c = s.getByte(k)
      if (c >= '0' && c <= '9') hasDigit = true
      k += 1
    }
    if (hasDigit) {
      // digit present but not simple-decimal: "0x1p1", "1.5f" still parse;
      // only digit-containing garbage pays the exception
      val str = utf8Range(s, i, end)
      try { java.lang.Double.parseDouble(str); DOUBLE }
      catch { case _: NumberFormatException => NONE }
    } else if (end - i <= 9) {
      // no digit: castable only as a special literal (longest: +infinity);
      // every spelling starts with n/N/i/I/+/-, so anything else skips
      // the String allocation outright
      val c0 = s.getByte(i)
      if (c0 != 'n' && c0 != 'N' && c0 != 'i' && c0 != 'I' && c0 != '+' && c0 != '-')
        return NONE
      val str = utf8Range(s, i, end).toLowerCase(java.util.Locale.ROOT)
      str match {
        case "nan" | "inf" | "+inf" | "-inf" | "infinity" | "+infinity" |
            "-infinity" => DOUBLE
        case _ => NONE
      }
    } else NONE
  }

  /** String of the byte range [from, until) — rare-path helper; the trim
    * offsets always land on ASCII boundaries (multibyte units are >= 0x80
    * and never trimmed), so byte-range decoding is well-formed. */
  private def utf8Range(s: org.apache.spark.unsafe.types.UTF8String,
                        from: Int, until: Int): String = {
    val b = new Array[Byte](until - from)
    var k = from
    while (k < until) { b(k - from) = s.getByte(k); k += 1 }
    new String(b, java.nio.charset.StandardCharsets.UTF_8)
  }
}

/** Slice of a binary payload by LONG offset/length: bytes
  * [off, min(off+len, size)), 0-based, clamped; empty (never null) when
  * the range falls outside the payload, empty or negative.
  *
  * Spark's builtin `Substring` takes Int positions: frame offsets
  * computed as longs (stride x index arithmetic) get silently WRAPPED by
  * the narrowing cast under non-ANSI semantics — an offset past 2^31
  * becomes a negative position and selects the wrong bytes instead of
  * failing. This expression keeps the whole offset space in long
  * (chunked/multi-part payloads address beyond 2 GiB even though one JVM
  * byte[] caps at Int.MaxValue), so an out-of-range request degrades to
  * an empty slice, never a mis-addressed one. Whole-stage codegen via a
  * static helper. */
case class BinarySlice(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_binary_slice"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (first.dataType == BinaryType && second.dataType == LongType &&
        third.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (BINARY, BIGINT off, BIGINT len), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, ${third.dataType.simpleString})")
  }

  override def nullSafeEval(b: Any, off: Any, len: Any): Any =
    BinarySlice.slice(b.asInstanceOf[Array[Byte]],
      off.asInstanceOf[Long], len.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, o, l) =>
      s"graft.expressions.BinarySlice.slice($b, $o, $l)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BinarySlice {
  private val empty = Array.emptyByteArray

  /** Static so generated code can call it without holding the expression. */
  def slice(b: Array[Byte], off: Long, len: Long): Array[Byte] = {
    if (off < 0 || len <= 0 || off >= b.length) empty
    else {
      val end = math.min(off + math.min(len, b.length.toLong), b.length.toLong)
      java.util.Arrays.copyOfRange(b, off.toInt, end.toInt)
    }
  }
}

/** md5-prefix hash of every element of a string array: element i ->
  * first `nibbles` hex digits of md5(s_i) as a long (== the column
  * formulation `conv(substring(md5(s),1,nibbles),16,10)::long` per
  * element). One digest instance per row instead of one interpreted
  * lambda + hex-string round-trip per element. */
case class Md5PrefixHashArray(child: Expression, nibbles: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_md5_hash_array"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("md5arr", this, classOf[Md5PrefixHashArray].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  def compute(arr: ArrayData): ArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val d = md.digest(arr.getUTF8String(i).getBytes)
      var v = 0L
      var k = 0
      while (k < nibbles) {
        val b = d(k >> 1) & 0xff
        val nib = if ((k & 1) == 0) b >> 4 else b & 0xf
        v = (v << 4) | nib
        k += 1
      }
      out(i) = v
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
