package graft.recipe

import java.util.regex.{Matcher, Pattern}

/** The reference's pre-parse regex line rewriter (bearysta
  * aggregate.py:184-243), as a pure per-file function usable inside a
  * distributed flatMap — per-file sequential (the `append` rule needs the
  * previous line), embarrassingly parallel across files.
  *
  * Semantics (first ordered rule list + implicit `^\s*$` -> drop):
  * for each line, scan ALL rules in order; a rule whose regex *searches*
  * (finds anywhere) the current line marks it kept, then:
  *  - Keep (null): leave line as-is, continue scanning;
  *  - Drop: discard, stop scanning;
  *  - Append: line becomes prev.rstrip + ' ' + line.lstrip, marked
  *    dropped, continue scanning (a later Replace can un-drop it);
  *  - Replace(r): line = regex.sub(r), marked kept, continue scanning
  *    (replacements chain).
  * Lines matched by no rule are dropped. `prev` tracks the possibly
  * rewritten previous line.
  */
object LineFilter {

  case class Rule(pattern: Pattern, action: LineAction)

  def compile(filters: Seq[(String, LineAction)]): Seq[Rule] =
    filters.map { case (re, act) => Rule(Pattern.compile(re), act) } :+
      Rule(Pattern.compile("^[\\s]*$"), LineAction.Drop)

  /** Python re.sub replacement -> Java: \1 backrefs become $1, literal $
    * escaped. */
  private[recipe] def javaRepl(pyRepl: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < pyRepl.length) {
      val c = pyRepl(i)
      if (c == '\\' && i + 1 < pyRepl.length && pyRepl(i + 1).isDigit) {
        sb.append('$').append(pyRepl(i + 1)); i += 2
      } else if (c == '\\' && i + 1 < pyRepl.length && pyRepl(i + 1) == 'g') {
        // \g<name> / \g<1>
        val close = pyRepl.indexOf('>', i)
        if (close > 0 && pyRepl(i + 2) == '<') {
          sb.append("${").append(pyRepl.substring(i + 3, close)).append('}')
          i = close + 1
        } else { sb.append(c); i += 1 }
      } else if (c == '$') { sb.append("\\$"); i += 1 }
      else if (c == '\\' && i + 1 < pyRepl.length) {
        sb.append(Matcher.quoteReplacement(pyRepl(i + 1).toString)); i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Lazy: pulls input lines only as output is consumed, so a first-line
    * probe reads one line and a multi-GB log never materializes a
    * filtered copy on the heap. */
  def apply(rules: Seq[Rule], lines: Iterator[String]): Iterator[String] =
    new Iterator[String] {
      private var prev = ""
      private var nextLine: String = _
      private var done = false

      private def advance(): Unit = {
        nextLine = null
        while (nextLine == null && lines.hasNext) {
          var line = lines.next()
          var dropLine = true
          var broke = false
          val it = rules.iterator
          while (it.hasNext && !broke) {
            val rule = it.next()
            if (rule.pattern.matcher(line).find()) {
              dropLine = false
              rule.action match {
                case LineAction.Keep => ()
                case LineAction.Drop =>
                  dropLine = true; broke = true
                case LineAction.Append =>
                  line = prev.replaceAll("\\s+$", "") + " " + line.replaceAll("^\\s+", "")
                  dropLine = true
                case LineAction.Replace(r) =>
                  line = rule.pattern.matcher(line).replaceAll(javaRepl(r))
                  dropLine = false
              }
            }
          }
          prev = line
          if (!dropLine) nextLine = line
        }
        if (nextLine == null) done = true
      }

      advance()
      override def hasNext: Boolean = !done
      override def next(): String = {
        if (done) throw new NoSuchElementException
        val r = nextLine; advance(); r
      }
    }
}
