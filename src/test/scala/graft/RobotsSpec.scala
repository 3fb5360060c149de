package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Robots

class RobotsSpec extends AnyFunSuite {

  private def ok(robots: String, path: String, agent: String = "graftbot"): Boolean =
    Robots.allowed(robots, agent.toLowerCase, path)

  test("longest-match precedence: the REP reference vectors") {
    // allow /p beats disallow / (5.. no: lengths 2 vs 1)
    val r1 = "User-agent: *\nAllow: /p\nDisallow: /\n"
    assert(ok(r1, "/page"))
    assert(!ok(r1, "/x"))
    // equal-length tie goes to allow
    val r2 = "User-agent: *\nAllow: /folder\nDisallow: /folder\n"
    assert(ok(r2, "/folder/page"))
    // /*.htm (6) beats /page (5)
    val r3 = "User-agent: *\nAllow: /page\nDisallow: /*.htm\n"
    assert(!ok(r3, "/page.htm"))
    assert(ok(r3, "/page.php"))
    // /$ (2) beats / (1): only the root is allowed
    val r4 = "User-agent: *\nAllow: /$\nDisallow: /\n"
    assert(ok(r4, "/"))
    assert(!ok(r4, "/page"))
  }

  test("wildcard matching: *, $, and their combinations") {
    val r = "User-agent: *\nDisallow: /fish*\n"
    assert(!ok(r, "/fish"))
    assert(!ok(r, "/fishheads/yummy.html"))
    assert(ok(r, "/Fish.asp")) // byte-literal: case matters in paths
    val rp = "User-agent: *\nDisallow: /*.php\n"
    assert(!ok(rp, "/index.php"))
    assert(!ok(rp, "/folder/filename.php?parameters"))
    assert(ok(rp, "/windows.PHP"))
    val rAnchor = "User-agent: *\nDisallow: /*.php$\n"
    assert(!ok(rAnchor, "/filename.php"))
    assert(ok(rAnchor, "/filename.php?parameters"))
    val rTmp = "User-agent: *\nDisallow: /tmp$\n"
    assert(!ok(rTmp, "/tmp"))
    assert(ok(rTmp, "/tmpfile"))
    // a $ not at the end is a literal octet
    val rMid = "User-agent: *\nDisallow: /a$b\n"
    assert(!ok(rMid, "/a$bc"))
    assert(ok(rMid, "/ab"))
    // multiple stars backtrack correctly
    val rMulti = "User-agent: *\nDisallow: /a*b*c$\n"
    assert(!ok(rMulti, "/aXbYbZc"))
    assert(ok(rMulti, "/aXbYcZ"))
  }

  test("group selection: exact token beats *, case-insensitive, merged across the file") {
    val r =
      """User-agent: GraftBot
        |Disallow: /private/
        |
        |User-agent: *
        |Disallow: /
        |
        |User-agent: graftbot
        |Disallow: /extra/
        |""".stripMargin
    // both graftbot groups merge; the * group is NOT consulted for graftbot
    assert(!ok(r, "/private/x"))
    assert(!ok(r, "/extra/x"))
    assert(ok(r, "/public/x"))
    // an unknown agent falls to the * group
    assert(!ok(r, "/public/x", agent = "otherbot"))
    // consecutive user-agent lines share one rule block
    val shared = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    assert(!ok(shared, "/x/1", agent = "a"))
    assert(!ok(shared, "/x/1", agent = "b"))
    assert(ok(shared, "/x/1", agent = "c"))
  }

  test("defaults: no matching group, no matching rule, empty values, rules before any group") {
    assert(ok("User-agent: otherbot\nDisallow: /\n", "/anything"))
    assert(ok("User-agent: *\nDisallow: /private/\n", "/public/x"))
    // `Disallow:` with no value disallows nothing (the RFC's own example)
    assert(ok("User-agent: *\nDisallow:\n", "/anything"))
    // rules before any user-agent line belong to no group
    assert(ok("Disallow: /\nUser-agent: *\nAllow: /\n", "/x"))
    // an empty file allows everything
    assert(ok("", "/x"))
  }

  test("lenient parse: comments, CRLF, junk lines, unknown fields never poison the policy") {
    val r = "# policy\r\nUser-Agent: *   # trailing comment\r\n" +
      "Crawl-delay: 10\r\nSitemap: https://x/s.xml\r\n<<<garbage>>>\r\n" +
      "DISALLOW: /secret/\r\n"
    assert(!ok(r, "/secret/x"))
    assert(ok(r, "/open"))
  }

  test("randomized differential: the backtracking glob agrees with a regex reference on 20k cases") {
    val rnd = new scala.util.Random(77)
    def randomFrom(chars: String, maxLen: Int): String =
      (0 until rnd.nextInt(maxLen + 1)).map(_ => chars(rnd.nextInt(chars.length))).mkString
    var checked = 0
    while (checked < 20000) {
      val pattern = "/" + randomFrom("ab/*", 8) + (if (rnd.nextBoolean()) "$" else "")
      val path = "/" + randomFrom("ab/", 10)
      // reference: translate the REP pattern to an anchored regex
      val anchored = pattern.endsWith("$")
      val core = (if (anchored) pattern.dropRight(1) else pattern)
        .flatMap {
          case '*' => ".*"
          case c if "\\^$.|?+()[]{}".contains(c) => "\\" + c
          case c => c.toString
        }
      val re = ("^" + core + (if (anchored) "$" else ".*") + "$").r
      val expected = re.findFirstIn(path).isDefined
      val got = graft.functions.Robots.ruleMatches(pattern, path)
      assert(got === expected, s"pattern=$pattern path=$path")
      checked += 1
    }
  }

  test("line cap: rules past MaxLines are ignored, the policy up to the cap stands") {
    val pad = Array.fill(Robots.MaxLines - 2)("# pad").mkString("\n")
    val r = s"User-agent: *\nDisallow: /a\n$pad\nDisallow: /b\n"
    assert(!ok(r, "/a1"))
    assert(ok(r, "/b1")) // past the cap: never parsed
  }

  test("longest-match precedence counts OCTETS, not Java chars (non-ASCII patterns)") {
    // The decisive vector: on path /éx both rules match. Allow /*x is
    // 3 chars = 3 octets; Disallow /éx is 3 chars = 4 octets (é is
    // 2 bytes in UTF-8). Char counting ties them (tie → allow); octet
    // counting — the RFC's "octets as written" — ranks the disallow
    // longer, so the path is BLOCKED.
    assert("é".getBytes("UTF-8").length === 2)
    val r = "User-agent: *\nAllow: /*x\nDisallow: /éx\n"
    assert(!ok(r, "/éx"))
    // and the inverse orientation: Allow the multibyte pattern, it wins
    val r2 = "User-agent: *\nDisallow: /*x\nAllow: /éx\n"
    assert(ok(r2, "/éx"))
    // ASCII patterns are unaffected (octets == chars)
    val r3 = "User-agent: *\nAllow: /ax\nDisallow: /a\n"
    assert(ok(r3, "/ax"))
  }

  test("sitemaps: field-scoped collection in file order, comments stripped, empties skipped") {
    def sitemaps(r: String): Seq[String] = {
      val arr = Robots.sitemapArray(r)
      (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
    }
    val r = "Sitemap: https://a/s.xml\n" +
      "User-agent: bot\nDisallow: /x\n" +
      "Sitemap: https://a/in-group.xml # trailing comment\n" +
      "Sitemap:\n" + // empty value: skipped
      "sitemap: https://a/lower.xml\n" // key case-insensitive
    assert(sitemaps(r) === Seq("https://a/s.xml", "https://a/in-group.xml",
      "https://a/lower.xml"))
    // the URL's own colon is not the key separator
    assert(sitemaps("Sitemap: http://h:8080/s.xml\n") === Seq("http://h:8080/s.xml"))
    assert(sitemaps("User-agent: *\nDisallow: /\n") === Seq.empty)
    // sitemap lines do not perturb group parsing
    assert(!ok("User-agent: *\nSitemap: https://a/s.xml\nDisallow: /x\n", "/x1"))
  }

  test("crawl-delay: selected-group scope, max-of-merged, junk ignored, default when absent") {
    def delay(r: String, agent: String = "graftbot", d: Long = 9L): Long =
      Robots.crawlDelay(r, agent.toLowerCase, d)
    // basic: the * group's delay applies
    assert(delay("User-agent: *\nCrawl-delay: 4\nDisallow: /x\n") === 4L)
    // exact group beats *: graftbot gets 2, others get 10
    val r = "User-agent: graftbot\nCrawl-delay: 2\nUser-agent: *\nCrawl-delay: 10\n"
    assert(delay(r) === 2L)
    assert(delay(r, agent = "otherbot") === 10L)
    // merged groups take the MAX (most polite)
    val r2 = "User-agent: graftbot\nCrawl-delay: 3\nUser-agent: graftbot\nCrawl-delay: 7\n"
    assert(delay(r2) === 7L)
    // duplicate lines WITHIN one group take the max too (same
    // most-polite rule — a later smaller value must not overwrite)
    assert(delay("User-agent: *\nCrawl-delay: 8\nCrawl-delay: 2\n") === 8L)
    assert(delay("User-agent: *\nCrawl-delay: 2\nCrawl-delay: 8\n") === 8L)
    // junk values are ignored (lenient parse): fractional, negative, words
    assert(delay("User-agent: *\nCrawl-delay: 1.5\n") === 9L)
    assert(delay("User-agent: *\nCrawl-delay: fast\n") === 9L)
    // absent → caller default
    assert(delay("User-agent: *\nDisallow: /x\n") === 9L)
    // crawl-delay before any group is ignored
    assert(delay("Crawl-delay: 5\nUser-agent: *\nDisallow: /x\n") === 9L)
    // a crawl-delay line ends a UA run: the next User-agent starts a NEW group
    val r3 = "User-agent: a\nCrawl-delay: 5\nUser-agent: graftbot\nCrawl-delay: 6\n"
    assert(delay(r3) === 6L)
    assert(delay(r3, agent = "a") === 5L)
  }
}
