package graft

import org.apache.spark.sql.functions._

import graft.ops.Robots

/** REP (RFC 9309) admission semantics: group scoping, longest-prefix
  * precedence, allow-beats-disallow ties, empty Disallow, and
  * crawl-by-default for hosts without robots. */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private val txt =
    """# policy
      |User-agent: evilbot
      |Disallow: /
      |
      |User-agent: googlebot
      |User-agent: *
      |Disallow: /private/
      |Disallow: /tmp
      |Allow: /private/ok
      |Disallow:
      |""".stripMargin

  private def rules = Robots.parseRobots(
    Seq(("h1.example", txt)).toDF("host", "txt"), "host", "txt")

  test("parse: only the matching group's rules survive, empty Disallow drops") {
    val r = rules.as[(String, String, Boolean)].collect().toSet
    assert(r == Set(
      ("h1.example", "/private/", false),
      ("h1.example", "/tmp", false),
      ("h1.example", "/private/ok", true)),
      s"got $r — the evilbot group must not leak into *")
  }

  test("parse: consecutive User-agent lines share one group") {
    val r = Robots.parseRobots(
      Seq(("h1.example", txt)).toDF("host", "txt"), "host", "txt",
      agent = "googlebot")
      .as[(String, String, Boolean)].collect().toSet
    assert(r.map(_._2) == Set("/private/", "/tmp", "/private/ok"),
      "googlebot shares the * group's rules via the stacked UA lines")
  }

  test("parse: CRLF robots.txt parses identically to LF (RFC 9309 NL)") {
    // a Windows-served file previously left \r on every value: the UA
    // never matched and the gate silently admitted everything
    val crlf = txt.replace("\n", "\r\n")
    val viaLf = rules.as[(String, String, Boolean)].collect().toSet
    val viaCrlf = Robots.parseRobots(
        Seq(("h1.example", crlf)).toDF("host", "txt"), "host", "txt")
      .as[(String, String, Boolean)].collect().toSet
    assert(viaCrlf == viaLf, s"CRLF diverged: $viaCrlf")
  }

  test("parse: agent tokens match case-insensitively; a specific group " +
      "excludes the * group (RFC 9309 §2.2.1)") {
    val policy =
      """User-agent: *
        |Allow: /private/public
        |
        |User-agent: MyBot
        |Disallow: /private
        |""".stripMargin
    val df = Seq(("h.example", policy)).toDF("host", "txt")
    // mybot's own group governs — the * group's longer Allow must NOT
    // leak in and carve /private/public back out
    val mine = Robots.parseRobots(df, "host", "txt", agent = "mybot")
      .as[(String, String, Boolean)].collect().toSet
    assert(mine == Set(("h.example", "/private", false)), s"got $mine")
    // an agent with no specific group falls back to *
    val other = Robots.parseRobots(df, "host", "txt", agent = "otherbot")
      .as[(String, String, Boolean)].collect().toSet
    assert(other == Set(("h.example", "/private/public", true)))
  }

  test("admission: RFC §2.2.3 wildcard and end-anchor rules match") {
    val policy =
      """User-agent: *
        |Disallow: /*?sessionid=
        |Disallow: /*.pdf$
        |Allow: /docs/
        |""".stripMargin
    val rs = Robots.parseRobots(
      Seq(("h.example", policy)).toDF("host", "txt"), "host", "txt")
    val urls = Seq(
      (1L, "h.example", "/page?sessionid=abc"),   // * rule: blocked
      (2L, "h.example", "/docs/manual.pdf"),      // $ rule vs /docs allow:
                                                  // /*.pdf$ (7 chars) < /docs/ — but
                                                  // longest PREFIX len: "/*.pdf$" raw len 7 > 6
      (3L, "h.example", "/docs/manual.pdf?x"),    // not pdf-at-end: allowed
      (4L, "h.example", "/open/page"))            // nothing matches: allowed
      .toDF("id", "host", "path")
    val got = Robots.filterAllowed(urls, rs, "host", "path", "id")
      .select("id", "allowed").as[(Long, Boolean)].collect().toMap
    assert(!got(1L), "wildcard sessionid rule must block")
    assert(!got(2L), "end-anchored pdf rule must block")
    assert(got(3L), "pdf not at end must not match the $ rule")
    assert(got(4L))
  }

  test("admission: longest prefix wins; allow beats disallow on ties") {
    val urls = Seq(
      (1L, "h1.example", "/private/ok/page"), // Allow /private/ok (longer)
      (2L, "h1.example", "/private/secret"),  // Disallow /private/
      (3L, "h1.example", "/tmpfile"),         // Disallow /tmp is a PREFIX
      (4L, "h1.example", "/public/page"),     // no rule matches
      (5L, "h2.example", "/private/secret"))  // host without robots
      .toDF("id", "host", "path")
    val got = Robots.filterAllowed(urls, rules, "host", "path", "id")
      .select($"id", $"allowed").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> false,
      4L -> true, 5L -> true), s"got $got")
  }

  test("admission: equal-length allow and disallow -> allow wins") {
    val r = Seq(
      ("h.e", "/a", false), ("h.e", "/b", true), ("h.e", "/b", false))
      .toDF("host", "prefix", "allow")
    val got = Robots.filterAllowed(
        Seq((1L, "h.e", "/b/page")).toDF("id", "host", "path"),
        r, "host", "path", "id")
      .select($"allowed").as[Boolean].collect().toSeq
    assert(got == Seq(true))
  }

  test("crawl delays: matching group's value, max of duplicates, junk ignored") {
    val t2 =
      """User-agent: evilbot
        |Crawl-delay: 99
        |
        |User-agent: *
        |Crawl-delay: 3
        |Crawl-delay: 7
        |Crawl-delay: soon
        |""".stripMargin
    val got = Robots.crawlDelays(
        Seq(("h1", t2), ("h2", "User-agent: *\nDisallow: /x\n"))
          .toDF("host", "txt"), "host", "txt")
      .as[(String, Long)].collect().toMap
    assert(got == Map("h1" -> 7L), s"got $got — h2 declares no delay, " +
      "evilbot's 99 must not leak, 'soon' must not parse")
  }

  test("sitemap: loc extraction trims, unescapes entities, dedups") {
    val xml = """<?xml version="1.0"?><urlset>
      |<url><loc> https://h/a </loc></url>
      |<url><loc>https://h/q?x=1&amp;y=2</loc></url>
      |<url><loc>https://h/a</loc></url>
      |</urlset>""".stripMargin
    val got = Robots.sitemapUrls(
        Seq(("h", xml)).toDF("host", "xml"), "host", "xml")
      .as[(String, String)].collect().map(_._2).sorted.toSeq
    assert(got == Seq("https://h/a", "https://h/q?x=1&y=2"))
  }

  test("q_robots_filter matches the plant's verdicts at sf0.001") {
    val got = SparkEntry.queries("q_robots_filter")(spark, sfDir)
    val bad = got.where(
      ($"host" === "src4.example.com" && !$"allowed") ||
      ($"host" =!= "src4.example.com" &&
        $"allowed" =!= (($"doc_id" % 3 =!= 1) || ($"doc_id" % 5 === 3))))
    assert(bad.count() == 0)
    assert(got.where(!$"allowed").count() > 0, "some URLs must be gated")
  }
}
