package graft.expressions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt (RFC 9309, the Robots Exclusion Protocol) — the
  * politeness contract between a crawl frontier and the hosts it
  * fetches. Implemented from the published RFC:
  *
  *   - groups = runs of `User-agent:` lines followed by `Allow:` /
  *     `Disallow:` rules; groups naming the same agent merge; unknown
  *     fields are ignored and do NOT split a group (RFC 9309 §2.2.4);
  *     the two extension fields every production crawler honors are
  *     parsed but kept OUT of the rule core: `Crawl-delay` as a
  *     group-scoped value (Bing/Yandex convention) and `Sitemap` as
  *     file-global URLs (sitemaps.org) — surfaced via
  *     [[RobotsCodec.extensionsFor]] / [[RobotsCrawlDelay]] /
  *     [[RobotsSitemaps]], never affecting allow/deny decisions;
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

  /** One parsed group before agent selection: the agents it names, its
    * allow/disallow rules, and its Crawl-delay (extension field — see
    * [[extensionsFor]]). */
  private final case class Group(agents: Set[String],
                                 rules: Vector[(Boolean, String)],
                                 delay: Option[Double])

  /** The ONE group parser both the RFC core ([[rulesFor]]) and the
    * extension surface ([[extensionsFor]]) read from: groups split on
    * User-agent runs exactly as the RFC prescribes; Crawl-delay is
    * captured as group state (it is a group rule in every engine that
    * honors it — Bing/Yandex convention); Sitemap is file-global
    * (sitemaps.org convention) and does NOT split a group; other
    * unknown fields stay ignored (§2.2.4). Returns (groups, sitemaps
    * in file order). */
  private def parseGroups(txt: String): (Vector[Group], Vector[String]) = {
    val bounded = if (txt.length <= MaxRobotsBytes) txt
      else txt.substring(0, MaxRobotsBytes)
    val groups = Vector.newBuilder[Group]
    val sitemaps = Vector.newBuilder[String]
    var agents = Set.empty[String]
    var rules = Vector.empty[(Boolean, String)]
    var delay = Option.empty[Double]
    var inAgentRun = false
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents, rules, delay)
      agents = Set.empty; rules = Vector.empty; delay = None
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
          case "crawl-delay" =>
            inAgentRun = false
            // first parseable value per group wins; junk is ignored
            // (forgiving parse, strict semantics — the file-wide rule)
            if (delay.isEmpty && agents.nonEmpty)
              delay = try {
                val d = value.toDouble
                if (d >= 0 && d.isFinite) Some(d) else None
              } catch { case _: NumberFormatException => None }
          case "sitemap" =>
            // file-global, group NOT split (an unknown-field kin)
            if (value.nonEmpty) sitemaps += value
          case _ => () // unknown: ignored, group intact
        }
      }
    }
    flush()
    (groups.result(), sitemaps.result())
  }

  /** The RFC's group-selection rule, shared by core and extensions:
    * groups naming the agent exactly (case-insensitive), else the `*`
    * groups, else nothing. */
  private def selectGroups(all: Vector[Group], userAgent: String): Vector[Group] = {
    val ua = userAgent.trim.toLowerCase
    val named = all.filter(_.agents.contains(ua))
    if (named.nonEmpty) named else all.filter(_.agents.contains("*"))
  }

  def rulesFor(txt: String, userAgent: String): Vector[Rule] =
    selectGroups(parseGroups(txt)._1, userAgent)
      .flatMap(_.rules)
      .map { case (allow, pat) => Rule(allow, pat, compilePattern(pat)) }

  /** Extension fields every production crawler honors though RFC 9309
    * leaves them out of the normative core: the Crawl-delay selected
    * for `userAgent` (the FIRST delay among the agent's selected
    * groups — named groups win over `*` exactly like rule selection;
    * None when the selected scope declares none, when the value is
    * unparseable, or when no group applies) and the file-global
    * Sitemap URLs in order of appearance. */
  def extensionsFor(txt: String, userAgent: String): (Option[Double], Vector[String]) = {
    val (groups, sitemaps) = parseGroups(txt)
    (selectGroups(groups, userAgent).flatMap(_.delay).headOption, sitemaps)
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

/** `graft_robots_crawl_delay(robotsTxt, userAgent)` — the Crawl-delay
  * seconds RFC 9309's extension convention selects for `userAgent`
  * ([[RobotsCodec.extensionsFor]]: named groups win over `*`, first
  * declared delay in the winning scope), as DOUBLE (fractional delays
  * are in the wild). NULL when the selected scope declares none, the
  * value is unparseable, or an input is NULL — the caller coalesces to
  * its default delay EXPLICITLY, mirroring the missing-robots rule of
  * [[RobotsAllowed]]. Evaluated on the per-host robots frame (one row
  * per host), never the frontier, so no per-row cache is needed. */
case class RobotsCrawlDelay(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_robots_crawl_delay"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (children.forall(_.dataType == StringType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (STRING robotsTxt, STRING userAgent)")
  }

  override def nullSafeEval(txt: Any, ua: Any): Any =
    RobotsCodec.extensionsFor(txt.asInstanceOf[UTF8String].toString,
        ua.asInstanceOf[UTF8String].toString)._1
      .map(java.lang.Double.valueOf).orNull

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** `graft_robots_sitemaps(robotsTxt)` — the file-global Sitemap URLs in
  * order of appearance (sitemaps.org convention; agent-independent), as
  * ARRAY<STRING>. Empty array when the file declares none; NULL only
  * for NULL input. */
case class RobotsSitemaps(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_robots_sitemaps"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName needs STRING robotsTxt")
  }

  override def nullSafeEval(txt: Any): Any = {
    val sm = RobotsCodec.extensionsFor(
      txt.asInstanceOf[UTF8String].toString, "*")._2
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      sm.map(s => UTF8String.fromString(s)).toArray[Any])
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
