package graft.sources

/** robots.txt (RFC 9309) parsing + path matching — the crawl-POLITENESS
  * gate that sits before WARC ingestion ([[Warc]]) in a real pipeline:
  * a fetch frontier filters candidate URLs through the host's robots
  * rules before any byte is requested, and a curation pipeline audits
  * an already-crawled corpus for pages that today's rules would
  * disallow (takedown hygiene). Pure-JDK string kernel, same
  * bytes-first fixture discipline as [[Warc]]: q191 plants a
  * deterministic robots.txt per source and the oracle states the
  * required allow/block decision per URL in closed form.
  *
  * The portable core of the spec implemented here:
  *   - groups: one or more consecutive `User-agent:` lines followed by
  *     `Allow:`/`Disallow:` rules; field names case-insensitive;
  *     `#` starts a comment; unknown fields ignored;
  *   - group selection: ALL groups whose product token equals the
  *     agent (case-insensitive) — if any match, ONLY those apply;
  *     otherwise the `*` groups; no group → everything allowed;
  *   - rule matching: patterns are path prefixes with `*` (any chars)
  *     and a final `$` (end anchor); the MOST SPECIFIC match wins =
  *     longest pattern in octets; Allow wins a length tie;
  *   - an empty `Disallow:` value matches nothing (the classic
  *     "allow all" idiom); no matching rule → allowed.
  */
object Robots {

  /** One rule: allow/disallow + raw pattern (its LENGTH is its
    * precedence, per RFC 9309's longest-match rule). */
  final case class Rule(allow: Boolean, pattern: String)

  /** Parsed groups: (agent tokens lowercased, rules in file order). */
  final case class Group(agents: Seq[String], rules: Seq[Rule])

  /** Parse robots.txt text into groups. A `User-agent` line after
    * rules starts a NEW group; consecutive `User-agent` lines share
    * one group (both per spec). */
  def parse(txt: String): Seq[Group] = {
    val groups = Seq.newBuilder[Group]
    var agents = List.empty[String]
    var rules = List.empty[Rule]
    var inAgents = false
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents.reverse, rules.reverse)
      agents = Nil; rules = Nil
    }
    for (raw <- txt.linesIterator) {
      val line = raw.indexOf('#') match {
        case -1 => raw.trim
        case i => raw.substring(0, i).trim
      }
      val sep = line.indexOf(':')
      if (sep > 0) {
        val field = line.substring(0, sep).trim.toLowerCase
        val value = line.substring(sep + 1).trim
        field match {
          case "user-agent" =>
            if (!inAgents) { flush(); inAgents = true }
            agents ::= value.toLowerCase
          case "allow" | "disallow" =>
            inAgents = false
            // empty Disallow (or Allow) matches nothing — skip
            if (value.nonEmpty) rules ::= Rule(field == "allow", value)
          case _ => inAgents = false // crawl-delay, sitemap, unknown
        }
      }
    }
    flush()
    groups.result()
  }

  /** Does `pattern` (prefix + `*` wildcards + optional final `$`)
    * match `path`? Greedy backtracking scan — patterns are tiny, paths
    * are URL-sized, so the simple O(|p|·|s|) walk is fine. */
  def matches(pattern: String, path: String): Boolean = {
    val (pat, anchored) =
      if (pattern.endsWith("$")) (pattern.dropRight(1), true) else (pattern, false)
    val parts = pat.split("\\*", -1)
    var pos = 0
    var i = 0
    while (i < parts.length) {
      val part = parts(i)
      if (i == 0) {
        if (!path.startsWith(part)) return false
        pos = part.length
      } else if (i == parts.length - 1 && anchored) {
        // last literal must sit at the END of the path
        return path.length - pos >= part.length && path.endsWith(part)
      } else {
        val at = path.indexOf(part, pos)
        if (at < 0) return false
        pos = at + part.length
      }
      i += 1
    }
    // reached only for patterns with no '*' before the '$' (or none at
    // all): anchored means the whole path must have been consumed
    !anchored || pos == path.length
  }

  /** The rules that govern `agent`: all exactly-matching agent groups,
    * else all `*` groups. */
  def rulesFor(groups: Seq[Group], agent: String): Seq[Rule] = {
    val a = agent.toLowerCase
    val exact = groups.filter(_.agents.contains(a))
    val chosen = if (exact.nonEmpty) exact else groups.filter(_.agents.contains("*"))
    chosen.flatMap(_.rules)
  }

  /** RFC 9309 decision: longest matching pattern wins; Allow wins a
    * length tie; no match → allowed. */
  def isAllowed(txt: String, agent: String, path: String): Boolean = {
    val applicable = rulesFor(parse(txt), agent).filter(r => matches(r.pattern, path))
    if (applicable.isEmpty) true
    else {
      val best = applicable.maxBy(r => (r.pattern.length, r.allow))
      best.allow
    }
  }
}
