package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Robots

/** robots.txt semantics, hand-computed: group attribution, agent
  * fallback, longest-prefix match, allow-wins-ties, the empty-
  * Disallow allow-all form, and case rules (directives and agent
  * names fold; paths do not). */
class RobotsSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def verdicts(txt: String, reqs: Seq[(String, String)])
      : Map[(String, String), Boolean] = {
    val hosts = Seq(("h", txt)).toDF("host", "txt")
    val r = reqs.map { case (a, p) => ("h", a, p) }
      .toDF("host", "agent", "upath")
    Robots.verdicts(Robots.rules(hosts, "host", "txt"), r)
      .select($"agent", $"upath", $"allowed")
      .as[(String, String, Boolean)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
  }

  test("longest prefix wins, allow breaks ties, unmatched paths allowed") {
    val txt = "User-agent: *\nDisallow: /p\nAllow: /p/ok\n" +
      "Disallow: /x\nAllow: /x" // exact tie on /x: allow wins
    val v = verdicts(txt, Seq(
      ("bot", "/p/no"), ("bot", "/p/ok"), ("bot", "/p/okay"),
      ("bot", "/x"), ("bot", "/free")))
    assert(v(("bot", "/p/no")) === false)   // /p (2) beats nothing
    assert(v(("bot", "/p/ok")) === true)    // /p/ok (5) beats /p (2)
    assert(v(("bot", "/p/okay")) === true)  // prefix of a longer path
    assert(v(("bot", "/x")) === true)       // tie -> Allow
    assert(v(("bot", "/free")) === true)    // no rule matches
  }

  test("agent groups: exact beats *, shared agent lines, boundary after rules, unknown directives ignored") {
    val txt = "# hdr\nUSER-AGENT: alpha\nUser-agent: beta\n" +
      "Disallow: /both\nCrawl-delay: 9\n" +
      "User-agent: *\nDisallow: /star\n"
    val v = verdicts(txt, Seq(
      ("alpha", "/both"), ("beta", "/both"), ("ALPHA", "/star"),
      ("gamma", "/star"), ("gamma", "/both")))
    // alpha and beta share one group (consecutive agent lines); the
    // Crawl-delay does NOT end it, the next User-agent line does
    assert(v(("alpha", "/both")) === false)
    assert(v(("beta", "/both")) === false)
    // exact group chosen -> the * rules do not apply to alpha
    assert(v(("ALPHA", "/star")) === true)
    // unknown agent falls back to *
    assert(v(("gamma", "/star")) === false)
    assert(v(("gamma", "/both")) === true)
  }

  test("crawlDelays: group attribution, shared agents, max-of-delays, malformed dropped") {
    val txt = "User-agent: *\nCrawl-delay: 4\nDisallow: /x\n\n" +
      "User-agent: a\nUser-agent: b\nCrawl-delay: 2\nCrawl-delay: 9\n\n" +
      "User-agent: c\nCrawl-delay: fast\n\n" +
      "User-agent: d\nDisallow: /y"
    val got = Robots.crawlDelays(
        Seq(("h", txt)).toDF("host", "txt"), "host", "txt")
      .select($"agent", $"delay_s").as[(String, Long)].collect().toMap
    // shared agent lines inherit; two delays keep the larger;
    // malformed 'fast' and delay-less groups contribute nothing
    assert(got == Map("*" -> 4L, "a" -> 9L, "b" -> 9L), got.toString)
  }

  test("crawlDelays: fractional delays ceil up (the polite direction), non-numeric still drop") {
    val txt = "User-agent: a\nCrawl-delay: 0.5\n\n" +
      "User-agent: b\nCrawl-delay: 2.4\nCrawl-delay: 1\n\n" +
      "User-agent: c\nCrawl-delay: fast"
    val got = Robots.crawlDelays(
        Seq(("h", txt)).toDF("host", "txt"), "host", "txt")
      .select($"agent", $"delay_s").as[(String, Long)].collect().toMap
    // 0.5 -> 1 (dropping a declared limit would be the IMPOLITE
    // read); max(ceil(2.4)=3, 1) = 3; 'fast' contributes nothing
    assert(got == Map("a" -> 1L, "b" -> 3L), got.toString)
  }

  test("whitelist pattern: a rule-less exact group still wins the agent pick (allow-all, not * fallback)") {
    val txt = "User-agent: goodbot\nDisallow:\n\n" +
      "User-agent: *\nDisallow: /"
    val v = verdicts(txt, Seq(
      ("goodbot", "/p"), ("goodbot", "/"), ("badbot", "/p")))
    // goodbot's own group exists (its only directive is the empty
    // allow-all Disallow:), so it must NOT fall back to the * group
    assert(v(("goodbot", "/p")) === true)
    assert(v(("goodbot", "/")) === true)
    assert(v(("badbot", "/p")) === false)
  }

  test("wildcard rules: * spans, $ anchors, metachars stay literal, rule length is the specificity") {
    val txt = "User-agent: *\nDisallow: /*?sid=\n" +
      "Disallow: /*.pdf$\nAllow: /p\nDisallow: /a.b"
    val v = verdicts(txt, Seq(
      ("bot", "/page?sid=1"), ("bot", "/page"),
      ("bot", "/docs/x.pdf"), ("bot", "/docs/x.pdfx"),
      ("bot", "/p/r.pdf"), ("bot", "/a.b/x"), ("bot", "/aXb/x")))
    assert(v(("bot", "/page?sid=1")) === false) // /*?sid= spans 'page'
    assert(v(("bot", "/page")) === true)        // no rule matches
    assert(v(("bot", "/docs/x.pdf")) === false) // $ anchors the end
    assert(v(("bot", "/docs/x.pdfx")) === true) // past the anchor
    // /*.pdf$ (len 7) beats Allow /p (len 2) on the SAME path
    assert(v(("bot", "/p/r.pdf")) === false)
    // literal rules keep exact-prefix semantics even with metachars
    assert(v(("bot", "/a.b/x")) === false)
    assert(v(("bot", "/aXb/x")) === true)       // '.' is not a regex dot
  }

  test("wildcard rules: mid-rule $ is literal, only the trailing one anchors") {
    val txt = "User-agent: *\nDisallow: /x$y*z$"
    val v = verdicts(txt, Seq(
      ("bot", "/x$yQQz"), ("bot", "/x$yQQzZ"), ("bot", "/xAyQQz")))
    assert(v(("bot", "/x$yQQz")) === false)  // literal $, * span, anchor
    assert(v(("bot", "/x$yQQzZ")) === true)  // anchored: no tail allowed
    assert(v(("bot", "/xAyQQz")) === true)   // mid $ must match literally
  }

  test("sitemaps: host-wide regardless of group position, case-folded directive, duplicates collapse") {
    val txt = "Sitemap: https://h/s1.xml\n" +
      "User-agent: *\nDisallow: /x\n" +
      "SITEMAP: https://h/s2.xml\n\n" +          // inside a group
      "User-agent: a\nDisallow: /y\n" +
      "sitemap: https://h/s1.xml\n" +            // duplicate collapses
      "Sitemap:"                                 // empty value drops
    val got = Robots.sitemaps(
        Seq(("h", txt)).toDF("host", "txt"), "host", "txt")
      .select($"sitemap_url").as[String].collect().toSet
    assert(got == Set("https://h/s1.xml", "https://h/s2.xml"),
      got.toString)
    // and declaring sitemaps does NOT perturb rule/delay grouping
    val v = verdicts(txt, Seq(("a", "/y/z"), ("b", "/x/z")))
    assert(v(("a", "/y/z")) === false && v(("b", "/x/z")) === false)
  }

  test("empty Disallow is allow-everything; paths stay case-sensitive; no robots at all allows") {
    val v1 = verdicts("User-agent: *\nDisallow:", Seq(("b", "/any")))
    assert(v1(("b", "/any")) === true)
    val v2 = verdicts("User-agent: *\nDisallow: /Case",
      Seq(("b", "/Case/x"), ("b", "/case/x")))
    assert(v2(("b", "/Case/x")) === false)
    assert(v2(("b", "/case/x")) === true)
    val v3 = verdicts("# nothing here", Seq(("b", "/p")))
    assert(v3(("b", "/p")) === true)
  }
}
