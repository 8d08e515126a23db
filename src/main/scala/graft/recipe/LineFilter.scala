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

  // Append's strip regexes, compiled once (they used to be re-compiled
  // by String.replaceAll on every appended line)
  private val TrailWs = Pattern.compile("\\s+$")
  private val LeadWs = Pattern.compile("^\\s+")

  /** Lazy: pulls input lines only as output is consumed, so a first-line
    * probe reads one line and a multi-GB log never materializes a
    * filtered copy on the heap.
    *
    * Per-task work (guide §1.2): one Matcher per rule is allocated at
    * iterator construction and `reset(line)` per line — the per-line
    * `pattern.matcher(line)` allocation (rules × lines of it) was pure
    * garbage; `find()` after reset and `replaceAll` (which resets
    * internally) are semantics-identical. */
  def apply(rules: Seq[Rule], lines: Iterator[String]): Iterator[String] =
    new Iterator[String] {
      private var prev = ""
      private var nextLine: String = _
      private var done = false
      private val matchers = rules.map(_.pattern.matcher("")).toArray
      private val actions = rules.map(_.action).toArray

      private def advance(): Unit = {
        nextLine = null
        while (nextLine == null && lines.hasNext) {
          var line = lines.next()
          var dropLine = true
          var broke = false
          var i = 0
          while (i < matchers.length && !broke) {
            val m = matchers(i)
            m.reset(line)
            if (m.find()) {
              dropLine = false
              actions(i) match {
                case LineAction.Keep => ()
                case LineAction.Drop =>
                  dropLine = true; broke = true
                case LineAction.Append =>
                  line = TrailWs.matcher(prev).replaceAll("") + " " +
                    LeadWs.matcher(line).replaceAll("")
                  dropLine = true
                case LineAction.Replace(r) =>
                  line = m.replaceAll(javaRepl(r))
                  dropLine = false
              }
            }
            i += 1
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
