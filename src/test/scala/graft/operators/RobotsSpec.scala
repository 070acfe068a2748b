package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** RFC 9309 semantics, one witness per rule: parsing/grouping (combined
  * headers, comments, case, rules-before-header), group selection
  * (named beats `*`, merge of multiple matching groups), longest-match
  * with Allow-ties, `*`/`$` patterns, empty-Disallow, default-allow,
  * header-only groups, crawl-delay carry, sitemap extraction.
  */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private val body =
    """# policy
      |User-agent: graftbot
      |User-agent: otherbot
      |Disallow: /private/
      |Allow: /private/ok/
      |Disallow: /*.json$
      |Crawl-delay: 2
      |
      |User-agent: *
      |Disallow: /
      |Allow: /public/
      |Disallow:
      |""".stripMargin

  private def verdictsFor(agent: String, paths: Seq[String]) = {
    val robots = Seq(("example.com", body)).toDF("host", "body")
    val rules = Robots.parseRules(robots, "host", "body")
    val urls = paths.map(("example.com", _)).toDF("host", "path")
    Robots.verdicts(urls, rules, agent)
      .collect().map(r => r.getString(1) ->
        (r.getBoolean(2), Option(r.getString(3)).orNull)).toMap
  }

  test("parseRules: combined headers, comments, groups, empty-Disallow drop") {
    val robots = Seq(("example.com", body)).toDF("host", "body")
    val rules = Robots.parseRules(robots, "host", "body").collect()
    // group 1 carries both agent tokens; group 2 is the star group
    val g1 = rules.filter(_.getLong(1) == 1L)
    assert(g1.forall(_.getSeq[String](2).toSet == Set("graftbot", "otherbot")))
    assert(g1.map(r => (r.getString(3), r.getString(4))).toSet ==
      Set(("disallow", "/private/"), ("allow", "/private/ok/"),
        ("disallow", "/*.json$")))
    assert(g1.forall(_.getDouble(5) == 2.0))
    val g2 = rules.filter(_.getLong(1) == 2L)
    assert(g2.forall(_.getSeq[String](2).toSet == Set("*")))
    // the empty Disallow: line is dropped, not a match-nothing rule row
    assert(g2.map(r => (r.getString(3), r.getString(4))).toSet ==
      Set(("disallow", "/"), ("allow", "/public/")))
  }

  test("verdicts: named group, longest match, $ anchor, default allow") {
    val v = verdictsFor("GraftBot", Seq(
      "/private/x", "/private/ok/y", "/data/a.json", "/data/a.jsonl",
      "/free/page"))
    assert(v("/private/x") === ((false, "/private/")))
    // Allow is longer than Disallow → allowed
    assert(v("/private/ok/y") === ((true, "/private/ok/")))
    // $ anchors: .json blocked, .jsonl not
    assert(v("/data/a.json") === ((false, "/*.json$")))
    assert(v("/data/a.jsonl")._1 === true)
    // no rule matches → allowed, no matched pattern
    assert(v("/free/page") === ((true, null)))
  }

  test("verdicts: star group when agent unnamed; allow wins equal length") {
    val v = verdictsFor("strangerbot", Seq("/public/x", "/private/x", "/"))
    assert(v("/public/x")._1 === true) // /public/ allow beats / disallow (longer)
    assert(v("/private/x")._1 === false) // star group Disallow: /
    assert(v("/")._1 === false)
    // equal-length tie: Allow wins
    val robots = Seq(("t.com", "User-agent: *\nDisallow: /a/\nAllow: /a/*\n"))
      .toDF("host", "body")
    val rules = Robots.parseRules(robots, "host", "body")
    val tie = Robots.verdicts(Seq(("t.com", "/a/x")).toDF("host", "path"),
      rules, "anybot").collect()
    assert(tie.head.getBoolean(2) === true)
  }

  test("verdicts: header-only named group means allow-all, not star fallback") {
    // a header-only group can only exist after a rule line closed the
    // previous group (or at EOF) — consecutive User-agent lines COMBINE
    // per RFC 9309 §2.2.1 even across blank lines
    val robots = Seq(("h.com",
      "User-agent: *\nDisallow: /\n\nUser-agent: vipbot\n"))
      .toDF("host", "body")
    val rules = Robots.parseRules(robots, "host", "body")
    val urls = Seq(("h.com", "/anything")).toDF("host", "path")
    assert(Robots.verdicts(urls, rules, "vipbot").collect()
      .head.getBoolean(2) === true)
    assert(Robots.verdicts(urls, rules, "randombot").collect()
      .head.getBoolean(2) === false)
  }

  test("parseRules: blank lines do NOT split combined User-agent headers") {
    val rules = Robots.parseRules(
      Seq(("c.com", "User-agent: a\n\nUser-agent: b\nDisallow: /x/\n"))
        .toDF("host", "body"), "host", "body").collect()
    assert(rules.length === 1)
    assert(rules.head.getSeq[String](2).toSet === Set("a", "b"))
  }

  test("verdicts: host with no robots rows at all is allowed") {
    val rules = Robots.parseRules(
      Seq(("other.com", "User-agent: *\nDisallow: /\n")).toDF("host", "body"),
      "host", "body")
    val v = Robots.verdicts(
      Seq(("norobots.com", "/x")).toDF("host", "path"), rules, "graftbot")
      .collect().head
    assert(v.getBoolean(2) === true)
    assert(v.isNullAt(3))
  }

  test("parseRules: rules before any User-agent header are ignored") {
    val rules = Robots.parseRules(
      Seq(("x.com", "Disallow: /lost/\nUser-agent: *\nDisallow: /kept/\n"))
        .toDF("host", "body"), "host", "body").collect()
    assert(rules.map(_.getString(4)).toSet === Set("/kept/"))
  }

  test("patternToRegex: metacharacters escaped, * expands, $ anchors") {
    val rows = Seq("/a+b(c)/", "/x/*/y$", "/p.q/")
      .toDF("pattern")
      .select(Robots.patternToRegex(col("pattern"))).as[String].collect()
    assert(rows(0) === "^/a\\+b\\(c\\)/")
    assert(rows(1) === "^/x/.*/y$")
    assert(rows(2) === "^/p\\.q/")
    // and the escape actually neutralizes: literal dot must not match 'q'
    val m = Seq(("/pXq/", "/p.q/")).toDF("path", "pattern")
      .withColumn("rx", Robots.patternToRegex(col("pattern")))
      .selectExpr("regexp_like(path, rx)").as[Boolean].collect()
    assert(m.head === false)
  }

  test("sitemaps: host-global, case-insensitive key, comments stripped") {
    val s = Robots.sitemaps(Seq(("e.com",
      "User-agent: *\nSitemap: https://e.com/s1.xml # main\nsitemap: https://e.com/s2.xml\n"))
      .toDF("host", "body"), "host", "body")
      .as[(String, String)].collect().toSet
    assert(s === Set(("e.com", "https://e.com/s1.xml"),
      ("e.com", "https://e.com/s2.xml")))
  }
}
