package graft.expressions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt (RFC 9309, the Robots Exclusion Protocol) — the
  * politeness contract between a crawl frontier and the hosts it
  * fetches. Implemented from the published RFC:
  *
  *   - groups = runs of `User-agent:` lines followed by `Allow:` /
  *     `Disallow:` rules; groups naming the same agent merge; unknown
  *     fields (Sitemap, Crawl-delay, ...) are ignored and do NOT split
  *     a group (RFC 9309 §2.2.4);
  *   - group selection: the crawler's product token matches a
  *     `User-agent:` value case-insensitively and exactly; when no
  *     group matches, the `*` groups apply; when neither exists, the
  *     crawl is unrestricted (§2.2.1);
  *   - rule matching is against the URI's path (plus `?query` when
  *     present): a rule pattern matches as a prefix, `*` matches any
  *     character sequence, a TRAILING `$` anchors the end (a `$`
  *     anywhere else is a literal — the published google matcher's
  *     convention); an empty rule value matches nothing (`Disallow:`
  *     alone = allow all, §2.2.2);
  *   - precedence: the most specific match wins = the matching rule
  *     whose PATTERN has the most octets (counted as written, `*`/`$`
  *     included); on a tie, allow wins; no matching rule = allowed
  *     (§2.2.2). Matching is byte-literal — percent-decoding
  *     equivalences are the caller's normalization concern, declared
  *     rather than guessed.
  */
object RobotsCodec {

  /** One merged-group rule: allow flag, the raw pattern (octet length =
    * precedence), and its compiled matcher. */
  final case class Rule(allow: Boolean, pattern: String, re: Pattern) {
    def octets: Int = pattern.getBytes("UTF-8").length
  }

  /** Compile a rule path-pattern: literal chars, `*` = any sequence,
    * trailing `$` = end anchor. */
  private[graft] def compilePattern(pat: String): Pattern = {
    val (body, anchored) =
      if (pat.endsWith("$")) (pat.dropRight(1), true) else (pat, false)
    val sb = new StringBuilder("^")
    body.foreach {
      case '*' => sb.append(".*")
      case c => sb.append(Pattern.quote(c.toString))
    }
    if (anchored) sb.append("$")
    Pattern.compile(sb.toString)
  }

  /** Parse `txt` and return the rules the RFC selects for `userAgent`
    * (merged across that agent's groups; `*` groups when no named group
    * matches; empty = unrestricted). Lines are `field ':' value` with
    * `#` comments stripped; parsing is forgiving of junk lines (the RFC
    * requires crawlers to tolerate them) but rule SEMANTICS stay
    * strict. */
  /** RFC 9309 §2.4: a crawler MUST parse at least 500 KiB and MAY
    * ignore the rest — the cap that keeps a hostile multi-megabyte
    * robots.txt from ballooning the per-task rule cache. */
  private val MaxRobotsBytes = 500 * 1024

  def rulesFor(txt: String, userAgent: String): Vector[Rule] = {
    val bounded = if (txt.length <= MaxRobotsBytes) txt
      else txt.substring(0, MaxRobotsBytes)
    val ua = userAgent.trim.toLowerCase
    final case class Group(agents: Set[String], rules: Vector[(Boolean, String)])
    val groups = Vector.newBuilder[Group]
    var agents = Set.empty[String]
    var rules = Vector.empty[(Boolean, String)]
    var inAgentRun = false
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents, rules)
      agents = Set.empty; rules = Vector.empty
    }
    for (raw <- bounded.linesIterator) {
      val line = raw.takeWhile(_ != '#').trim
      val ci = line.indexOf(':')
      if (ci > 0) {
        val field = line.substring(0, ci).trim.toLowerCase
        val value = line.substring(ci + 1).trim
        field match {
          case "user-agent" =>
            if (!inAgentRun) flush() // a UA line after rules starts a new group
            agents += value.toLowerCase
            inAgentRun = true
          case "allow" | "disallow" =>
            inAgentRun = false
            // empty value = matches nothing (RFC 9309 §2.2.2)
            if (value.nonEmpty && agents.nonEmpty)
              rules :+= (field == "allow", value)
          case _ => () // Sitemap / Crawl-delay / unknown: ignored, group intact
        }
      }
    }
    flush()
    val all = groups.result()
    val named = all.filter(_.agents.contains(ua))
    val chosen = if (named.nonEmpty) named else all.filter(_.agents.contains("*"))
    chosen.flatMap(_.rules)
      .map { case (allow, pat) => Rule(allow, pat, compilePattern(pat)) }
      .toVector
  }

  /** RFC 9309 decision for one path (plus query) under pre-selected
    * rules: longest matching pattern wins, allow on ties, allowed when
    * nothing matches. */
  def allowed(rules: Vector[Rule], path: String): Boolean = {
    val p = if (path.isEmpty) "/"
      else if (path.charAt(0) == '?') "/" + path
      else path
    var bestLen = -1
    var bestAllow = true
    var i = 0
    while (i < rules.length) {
      val r = rules(i)
      if (r.re.matcher(p).lookingAt()) {
        val len = r.octets
        if (len > bestLen || (len == bestLen && r.allow && !bestAllow)) {
          bestLen = len; bestAllow = r.allow
        }
      }
      i += 1
    }
    bestAllow
  }
}

/** `graft_robots_allowed(robotsTxt, userAgent, path)` — TRUE when RFC
  * 9309 permits `userAgent` to fetch `path` under `robotsTxt`
  * ([[RobotsCodec]]). NULL robots/agent/path yields NULL (standard SQL
  * three-valued logic — a frontier join coalesces a missing robots.txt
  * to allowed EXPLICITLY, not silently). Per-task cache of parsed +
  * selected rule sets keyed (robotsTxt, userAgent): a corpus partition
  * revisits the same few thousand hosts, so each robots file parses
  * once per task, not once per URL. */
case class RobotsAllowed(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_robots_allowed"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (children.forall(_.dataType == StringType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (STRING robotsTxt, STRING userAgent, STRING path)")
  }

  @transient private lazy val cache =
    new java.util.HashMap[(String, String), Vector[RobotsCodec.Rule]]()

  override def nullSafeEval(txt: Any, ua: Any, path: Any): Any = {
    val key = (txt.asInstanceOf[UTF8String].toString,
      ua.asInstanceOf[UTF8String].toString)
    var rules = cache.get(key)
    if (rules == null) {
      rules = RobotsCodec.rulesFor(key._1, key._2)
      if (cache.size >= (1 << 12)) cache.clear() // bound task memory
      cache.put(key, rules)
    }
    RobotsCodec.allowed(rules, path.asInstanceOf[UTF8String].toString)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}
