package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_script_counts(text)` — the Unicode-script census behind
  * `TextAnalysis.scriptProfile` / `langId` in ONE pass over the code
  * points (ARRAY<BIGINT>, fixed layout below), replacing the
  * strip-and-diff regex sweep the router used to pay per script class
  * (the round-8 q19 regression: one `regexp_replace` per class per
  * row). Semantics are bit-identical to the regex formulation it
  * replaces:
  *
  *   - whitespace = Java regex `\s` (space, \t, \n, \x0B, \f, \r) —
  *     excluded from every count, exactly like the
  *     `regexp_replace(text, "\\s", "")` pre-strip;
  *   - script classes via `Character.UnicodeScript.of` — the same
  *     Unicode Script property Java's `\p{IsLatin}` and RE2's
  *     `\p{Latin}` read, so the DuckDB mirror's length-after-strip
  *     arithmetic still matches;
  *   - counts are per CODE POINT (what both Spark `length` and DuckDB
  *     `length` count), astral-safe.
  *
  * Layout: [0]=total non-whitespace, [1]=Latin, [2]=Cyrillic, [3]=Han,
  * [4]=Arabic, [5]=Hangul, [6]=Devanagari, [7]=Thai, [8]=Greek,
  * [9]=Hebrew, [10]=ASCII digits, [11]=kana (Hiragana+Katakana).
  */
case class ScriptCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_script_counts"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs STRING text, got ${child.dataType.simpleString}")
  }

  override def nullSafeEval(text: Any): Any =
    ScriptCounts.census(text.asInstanceOf[UTF8String])

  /** Real codegen (the CodegenFallback form re-evaluated the child via
    * interpretation per row and boxed it — the residual q19 cost): the
    * generated code passes the already-computed UTF8String straight to
    * the static census, keeping the projection inside whole-stage
    * codegen. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.ScriptCounts$$.MODULE$$.census($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ScriptCounts {

  /** The census itself — shared by interpreted eval and the generated
    * code (called static via `ScriptCounts$.MODULE$`). */
  def census(text: UTF8String): ArrayData = {
    val s = text.toString
    val c = new Array[Long](N)
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      // Java regex \s — the pre-strip class of the regex formulation
      val ws = cp == 0x20 || (cp >= 0x09 && cp <= 0x0D)
      if (!ws) {
        c(Total) += 1
        import Character.UnicodeScript
        UnicodeScript.of(cp) match {
          case UnicodeScript.LATIN => c(Latin) += 1
          case UnicodeScript.CYRILLIC => c(Cyrillic) += 1
          case UnicodeScript.HAN => c(Han) += 1
          case UnicodeScript.ARABIC => c(Arabic) += 1
          case UnicodeScript.HANGUL => c(Hangul) += 1
          case UnicodeScript.DEVANAGARI => c(Devanagari) += 1
          case UnicodeScript.THAI => c(Thai) += 1
          case UnicodeScript.GREEK => c(Greek) += 1
          case UnicodeScript.HEBREW => c(Hebrew) += 1
          case UnicodeScript.HIRAGANA | UnicodeScript.KATAKANA =>
            c(Kana) += 1
          case _ => ()
        }
        if (cp >= '0' && cp <= '9') c(Digits) += 1
      }
      i += Character.charCount(cp)
    }
    ArrayData.toArrayData(c)
  }

  // array layout (0-based; add 1 for Spark's 1-based element_at)
  val Total = 0
  val Latin = 1
  val Cyrillic = 2
  val Han = 3
  val Arabic = 4
  val Hangul = 5
  val Devanagari = 6
  val Thai = 7
  val Greek = 8
  val Hebrew = 9
  val Digits = 10
  val Kana = 11
  val N = 12
}
