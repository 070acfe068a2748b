package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt crawl-policy engine (RFC 9309) — the per-domain policy
  * step a crawl corpus applies between URL canonicalization
  * ([[UrlOps]]) and fetching/keeping a page. The reference pipeline's
  * analogue is its per-contract blacklist/whitelist routing; here the
  * policy text itself is DATA (one robots.txt body per host), parsed
  * and applied as relational operators, no UDF anywhere.
  *
  * Semantics implemented (the RFC 9309 core):
  *   - `#` comments stripped, keys case-insensitive, values trimmed;
  *   - consecutive `User-agent:` lines form ONE group header; the
  *     group's rules run until the next header (a `User-agent` line
  *     that follows a rule line starts a NEW group);
  *   - group selection per (host, agent): the group naming the agent's
  *     product token beats the `*` group; agent token match is
  *     case-insensitive;
  *   - rule match: `*` is a wildcard, `$` anchors the end, otherwise
  *     the pattern is a path PREFIX; the longest matching pattern (in
  *     octets) wins; `Allow` wins length ties; an empty `Disallow:`
  *     value matches nothing; no matching rule means ALLOWED;
  *   - `Crawl-delay` (non-standard but ubiquitous) is carried per
  *     group; `Sitemap:` lines are host-global.
  *
  * Scale shape: robots bodies are small and per-host (the parse is a
  * per-host sort window over a few hundred lines); the verdict join is
  * URL ⋈ rules on host — rules-side rows = groups×rules per host, so
  * the join broadcasts for any real blocklist and the URL side never
  * shuffles more than once. Pattern→regex translation is codegen'd
  * string work; the per-row `regexp_like` with a column pattern is the
  * only non-constant regex (bounded by rules-per-host, not corpus).
  */
object Robots {

  /** Parse robots.txt bodies into a rule table.
    *
    * Input: `df(hostCol, bodyCol)` — one robots.txt body per host.
    * Output: one row per (host, group, agent-token, rule):
    * `host, group_id, agents (array), directive (allow|disallow),
    * pattern, crawl_delay (per group, null when absent)`.
    * Groups with only a header (no rules) still emit one null-pattern
    * row so "named group exists with no rules" means allow-all (the
    * RFC's answer) rather than falling back to `*`.
    */
  def parseRules(df: DataFrame, hostCol: String, bodyCol: String): DataFrame = {
    // line table, order preserved per host
    val lines = df.select(
        col(hostCol).as("host"),
        posexplode(split(col(bodyCol), "\n")).as(Seq("pos", "raw")))
      .select(col("host"), col("pos"),
        trim(regexp_replace(col("raw"), "#.*$", "")).as("line"))
      .filter(col("line") =!= "")
      .select(col("host"), col("pos"),
        lower(trim(regexp_extract(col("line"), "^([^:]+):", 1))).as("key"),
        trim(regexp_extract(col("line"), "^[^:]+:(.*)$", 1)).as("value"))
      .filter(col("key").isInCollection(
        Seq("user-agent", "allow", "disallow", "crawl-delay", "sitemap")))

    // group id: a user-agent line NOT preceded by another user-agent
    // line opens a new group (RFC 9309 §2.2.1 combined headers)
    val w = Window.partitionBy("host").orderBy("pos")
    val grouped = lines
      .withColumn("is_ua", (col("key") === "user-agent").cast("int"))
      .withColumn("prev_ua", coalesce(lag(col("is_ua"), 1).over(w), lit(0)))
      .withColumn("new_group",
        ((col("is_ua") === 1) && (col("prev_ua") === 0)).cast("int"))
      .withColumn("group_id", sum(col("new_group")).over(w))
      .filter(col("group_id") >= 1) // rules before any header are ignored
      .filter(col("key") =!= "sitemap") // host-global, not group-scoped

    val agents = grouped.filter(col("key") === "user-agent")
      .groupBy("host", "group_id")
      .agg(collect_set(lower(col("value"))).as("agents"))
    val delays = grouped.filter(col("key") === "crawl-delay")
      .groupBy("host", "group_id")
      .agg(min(col("value").cast("double")).as("crawl_delay"))
    val rules = grouped
      .filter(col("key").isInCollection(Seq("allow", "disallow")))
      // empty Disallow: matches nothing — drop it here so "group with
      // only `Disallow:`" behaves as allow-all; empty Allow likewise
      .filter(col("value") =!= "")
      .select(col("host"), col("group_id"),
        col("key").as("directive"), col("value").as("pattern"))

    agents
      .join(rules, Seq("host", "group_id"), "left")
      .join(delays, Seq("host", "group_id"), "left")
      .select(col("host"), col("group_id"), col("agents"),
        col("directive"), col("pattern"), col("crawl_delay"))
  }

  /** Sitemap URLs per host (host-global per RFC 9309 §2.3). */
  def sitemaps(df: DataFrame, hostCol: String, bodyCol: String): DataFrame =
    df.select(col(hostCol).as("host"),
        explode(split(col(bodyCol), "\n")).as("raw"))
      .select(col("host"),
        trim(regexp_replace(col("raw"), "#.*$", "")).as("line"))
      .filter(lower(col("line")).startsWith("sitemap:"))
      .select(col("host"),
        trim(regexp_extract(col("line"), "(?i)^sitemap:(.*)$", 1))
          .as("sitemap_url"))

  /** RFC 9309 rule pattern → anchored Java regex, as a codegen'd
    * column expression: regex metacharacters escaped, `*` → `.*`, a
    * trailing `$` kept as the anchor (escaped anywhere else).
    */
  def patternToRegex(pattern: Column): Column = {
    val anchored = pattern.endsWith("$")
    val body = when(anchored, pattern.substr(lit(1), length(pattern) - 1))
      .otherwise(pattern)
    // escape everything regex-special except our wildcard, then expand it
    val escaped = regexp_replace(body, "([.\\[\\]{}()+?^$\\\\|])", "\\\\$1")
    val wild = regexp_replace(escaped, "\\*", ".*")
    concat(lit("^"), wild, when(anchored, lit("$")).otherwise(lit("")))
  }

  /** Verdict per URL: `host, path, allowed, matched_pattern,
    * matched_directive, crawl_delay`. `urls(hostCol, pathCol)`;
    * `ruleTable` is `parseRules` output. `agent` is the crawler's
    * product token (lowercased for matching).
    *
    * Group selection, longest-match, Allow-ties, default-allow all per
    * the object contract. URLs on hosts with no robots.txt at all are
    * allowed (the fetch-404 convention).
    */
  def verdicts(
      urls: DataFrame,
      ruleTable: DataFrame,
      agent: String,
      hostCol: String = "host",
      pathCol: String = "path"): DataFrame = {
    val tok = agent.toLowerCase
    // pick the group per host: named beats `*`
    val scoped = ruleTable
      .withColumn("named", array_contains(col("agents"), tok))
      .withColumn("star", array_contains(col("agents"), "*"))
      .filter(col("named") || col("star"))
    val hostHasNamed = scoped.groupBy("host")
      .agg(max(col("named").cast("int")).as("has_named"))
    val chosen = scoped.join(hostHasNamed, "host")
      .filter((col("has_named") === 1 && col("named")) ||
        (col("has_named") === 0 && col("star")))
      .select(col("host"), col("directive"), col("pattern"),
        col("crawl_delay"),
        when(col("pattern").isNotNull,
          patternToRegex(col("pattern"))).as("rx"))

    val u = urls.select(col(hostCol).as("host"), col(pathCol).as("path"))
      .distinct()
    // rules side is groups×rules per host — broadcast for any real
    // policy corpus; at genuinely huge rule sets the equi-join on host
    // shuffles both sides once
    val joined = u.join(chosen, Seq("host"), "left")
      .withColumn("hit",
        col("pattern").isNotNull && expr("regexp_like(path, rx)"))
    // longest pattern wins; allow beats disallow at equal length; hits
    // rank ahead of misses so rn=1 is the winning rule iff any rule hit
    val rank = Window.partitionBy("host", "path")
      .orderBy(col("hit").desc, length(col("pattern")).desc,
        (col("directive") === "allow").desc)
    joined
      .withColumn("rn", row_number().over(rank))
      .groupBy("host", "path")
      .agg(
        max(when(col("rn") === 1 && col("hit"), col("directive")))
          .as("matched_directive"),
        max(when(col("rn") === 1 && col("hit"), col("pattern")))
          .as("matched_pattern"),
        min(col("crawl_delay")).as("crawl_delay"))
      .withColumn("allowed",
        coalesce(col("matched_directive") =!= "disallow", lit(true)))
      .select(col("host"), col("path"), col("allowed"),
        col("matched_pattern"), col("matched_directive"),
        col("crawl_delay"))
  }
}
