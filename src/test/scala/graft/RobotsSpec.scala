package graft

import graft.sources.Robots

/** Direct pins for the RFC 9309 kernel: group selection, longest-match
  * precedence, allow-tie-break, `*`/`$` patterns, empty-Disallow, and
  * parser robustness (comments, case, unknown fields, rule-less
  * groups). */
class RobotsSpec extends SparkSpec {

  private val txt =
    """# graft fixture robots
      |User-agent: graftbot
      |Disallow: /zh/
      |Allow: /zh/post/1
      |
      |User-agent: a
      |User-agent: b
      |Disallow: /shared/
      |
      |User-agent: *
      |Disallow: /*/post/49$
      |Disallow: /de/
      |Allow: /de/post/7
      |Crawl-delay: 10
      |""".stripMargin

  test("group selection: exact agent group wins; fallback to *; unknown agent with no * allows") {
    // graftbot gets ONLY its group: /de/ is not blocked for it
    Robots.isAllowed(txt, "graftbot", "/de/post/3") shouldBe true
    Robots.isAllowed(txt, "graftbot", "/zh/post/3") shouldBe false
    // otherbot falls to *
    Robots.isAllowed(txt, "otherbot", "/de/post/3") shouldBe false
    Robots.isAllowed(txt, "OtherBot", "/zh/post/3") shouldBe true
    // agent match is case-insensitive
    Robots.isAllowed(txt, "GraftBot", "/zh/post/3") shouldBe false
    // no groups at all -> allowed
    Robots.isAllowed("# empty", "anyone", "/x") shouldBe true
  }

  test("multi-agent group header applies to every listed token") {
    Robots.isAllowed(txt, "a", "/shared/x") shouldBe false
    Robots.isAllowed(txt, "b", "/shared/x") shouldBe false
    Robots.isAllowed(txt, "a", "/de/") shouldBe true // not the * group
  }

  test("longest match wins; Allow wins a length tie") {
    // /zh/post/1 (10) beats /zh/ (4): post 1 and its prefix-family allowed
    Robots.isAllowed(txt, "graftbot", "/zh/post/1") shouldBe true
    Robots.isAllowed(txt, "graftbot", "/zh/post/12") shouldBe true // prefix match
    Robots.isAllowed(txt, "graftbot", "/zh/post/2") shouldBe false
    // Allow /de/post/7 (11) beats Disallow /de/ (4) for *
    Robots.isAllowed(txt, "x", "/de/post/7") shouldBe true
    Robots.isAllowed(txt, "x", "/de/post/8") shouldBe false
    // explicit length tie: Allow and Disallow same pattern length
    val tie = "User-agent: *\nDisallow: /p/\nAllow: /q/\nDisallow: /q/\n"
    Robots.isAllowed(tie, "x", "/q/z") shouldBe true
  }

  test("* wildcard and $ anchor") {
    Robots.isAllowed(txt, "x", "/en/post/49") shouldBe false // /*/post/49$
    Robots.isAllowed(txt, "x", "/en/post/490") shouldBe true // anchor: no match
    // the * consumes >= 0 chars but cannot overlap the literal parts:
    // "/post/49" has no room for both "/" and "/post/49" -> no match
    Robots.isAllowed(txt, "x", "/post/49") shouldBe true
    val g = "User-agent: *\nDisallow: /*/post/49$\n"
    Robots.matches("/*/post/49$", "/post/49") shouldBe false
    Robots.matches("/*/post/49$", "/a//post/49") shouldBe true
    Robots.matches("/a*b", "/axxb-tail") shouldBe true
    Robots.matches("/a*b$", "/axxb") shouldBe true
    Robots.matches("/a*b$", "/axxb-tail") shouldBe false
    Robots.matches("/a*$", "/a-anything") shouldBe true
    Robots.matches("/de/$", "/de/") shouldBe true
    Robots.matches("/de/$", "/de/x") shouldBe false
    Robots.matches("$", "/x") shouldBe false // matches only the empty path
    Robots.isAllowed(g, "x", "/q/post/49") shouldBe false
  }

  test("empty Disallow matches nothing (allow-all idiom); unknown fields ignored") {
    val t = "User-agent: *\nDisallow:\nCrawl-delay: 5\nSitemap: https://x/s.xml\n"
    Robots.isAllowed(t, "x", "/anything") shouldBe true
    Robots.parse(t).head.rules shouldBe empty
  }

  test("parser: comments stripped, field names case-insensitive, rule-less group kept") {
    val t = "USER-AGENT: Spider # trailing comment\nDISALLOW: /a # comment\n"
    Robots.isAllowed(t, "spider", "/a/b") shouldBe false
    // blank lines do NOT end a user-agent run: lonely and * MERGE into
    // one group (the reference-parser behavior) -> lonely is blocked
    val merged = "User-agent: lonely\n\nUser-agent: *\nDisallow: /\n"
    Robots.isAllowed(merged, "lonely", "/x") shouldBe false
    // a non-group field between them DOES split: lonely's group is
    // empty -> selected -> allowed; * group not consulted
    val split = "User-agent: lonely\nCrawl-delay: 1\nUser-agent: *\nDisallow: /\n"
    Robots.isAllowed(split, "lonely", "/x") shouldBe true
    Robots.isAllowed(split, "someone", "/x") shouldBe false
  }

  test("fixture-shaped decision table matches the q191 closed form") {
    // the q191 planting: see TextQueries.q191 — sources i%4<2 carry a
    // graftbot group (i%2==0 adds the /zh/post/1 allow), all carry *
    def robotsTxt(i: Int): String = {
      val g =
        if (i % 4 < 2)
          "User-agent: graftbot\nDisallow: /zh/\n" +
            (if (i % 2 == 0) "Allow: /zh/post/1\n" else "")
        else ""
      g + "User-agent: *\nDisallow: /*/post/49$\nDisallow: /de/\n"
    }
    def expected(i: Int, lang: String, post: Long): Boolean =
      if (i % 4 < 2)
        !(lang == "zh") ||
          (i % 2 == 0 && (post == 1 || (post >= 10 && post <= 19)))
      else !(lang == "de" || post == 49)
    for (i <- 0 until 8; lang <- Seq("en", "de", "zh"); post <- Seq(1L, 7L, 12L, 49L)) {
      val path = s"/$lang/post/$post"
      withClue(s"i=$i path=$path") {
        Robots.isAllowed(robotsTxt(i), "graftbot", path) shouldBe expected(i, lang, post)
      }
    }
  }
}
