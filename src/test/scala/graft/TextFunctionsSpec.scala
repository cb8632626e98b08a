package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions._

class TextFunctionsSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String)(
      implicit e: org.apache.spark.sql.Encoder[T]): T =
    Seq(text).toDF("text").select(c).as[T].head()

  test("token counting: whitespace and BPE-ish") {
    assert(one[Int](tokenCount($"text"), "Hello  world,  test") == 3)
    assert(one[Int](bpeishTokenCount($"text"), "don't stop-me now!") == 8)
    assert(one[Int](tokenCount($"text"), "   ") == 0)
  }

  test("shingles: empty below k, sliding windows at k") {
    assert(one[Seq[String]](charShingles($"text", 5), "abcd") == Seq())
    assert(one[Seq[String]](charShingles($"text", 5), "abcdef") == Seq("abcde", "bcdef"))
    assert(one[Seq[String]](wordShingles(whitespaceTokens($"text"), 2), "a b c")
      == Seq("a b", "b c"))
    assert(one[Seq[String]](wordShingles(whitespaceTokens($"text"), 3), "a b") == Seq())
  }

  test("langid: marker voting with CJK override and und fallback") {
    val cases = Seq(
      "The cat and the dog is a pet of the house" -> "en",
      "Le chat et la maison des amis les plus" -> "fr",
      "Der Hund und die Katze das ist gut" -> "de",
      "El perro y los gatos las casas es grande" -> "es",
      "这是一个中文句子" -> "zh",
      "qwrt zxcv bnmp" -> "und")
    cases.foreach { case (text, want) =>
      assert(one[String](langid($"text"), text) == want, s"for: $text")
    }
  }

  test("quality metrics ratios are guarded and 6dp-rounded") {
    val m = Seq("Hello, world! The THE the")
      .toDF("text").select(qualityMetrics($"text").as("m")).select("m.*").head()
    assert(m.getInt(0) == 25)        // n_chars
    assert(m.getInt(1) == 5)         // n_words
    assert(m.getDouble(2) == 0.08)   // punct 2/25 (comma, bang)
    assert(m.getDouble(4) == 0.6)    // stopwords 3/5
    val empty = Seq("").toDF("text")
      .select(qualityMetrics($"text").as("m")).select("m.*").head()
    assert(empty.getDouble(2) == 0.0 && empty.getDouble(4) == 0.0)
  }

  test("fingerprint is order-sensitive and stable") {
    val fp = (t: String) => one[Long](fingerprint(whitespaceTokens($"text")), t)
    assert(fp("a b") != fp("b a"))
    assert(fp("a b") == fp("a b"))
    assert(fp("") == 0L)
    assert(fp("a b") >= 0L && fp("a b") < 1000000007L)
  }

  test("stripMarkup: blocks, tags, entity ordering, whitespace, malformed") {
    val st = (t: String) => one[String](stripMarkup($"text"), t)
    // script/style content dropped wholesale, incl. attrs + case
    assert(st("a<SCRIPT src='x'>var j = '<b>keep?</b>';</script >b") == "a b")
    assert(st("a<style media=\"x\">p { color: red }</style>b") == "a b")
    // remaining tags become separators; runs collapse; ends trim
    assert(st(" <p>hello<br/>world</p> ") == "hello world")
    // entities, incl. the amp-last ordering: &amp;lt; is the TEXT &lt;
    assert(st("x &lt;tag&gt; &quot;q&quot; &#39;a&#39; y&nbsp;z &amp; w") ==
      "x <tag> \"q\" 'a' y z & w")
    assert(st("&amp;lt;table&amp;gt;") == "&lt;table&gt;")
    // malformed: an unclosed < drops the run to the next >
    assert(st("a <b unclosed c> d") == "a d")
    // already-clean prose passes through; one pass only — unescaped
    // entities that FORM tags are prose here, by design (re-stripping
    // the output would eat them, which is why this is a single pass)
    assert(st("plain text stays") == "plain text stays")
    assert(st("<p>x &lt;y&gt;</p>") == "x <y>")
  }

  test("fixMojibake: real CP1252 mojibake phrases repaired; clean text untouched") {
    def fm(t: String): String = one[String](fixMojibake($"text"), t)
    // the classic UTF-8-read-as-CP1252 accidents
    assert(fm("Ã©tÃ©") == "été")
    assert(fm("donâ€™t â€œquoteâ€¦ naÃ¯ve") == "don’t “quote… naïve")
    assert(fm("â‚¬ 5 â€“ cafÃ©") == "€ 5 – café")
    // clean text — including already-correct accents — passes through
    assert(fm("plain ascii stays") == "plain ascii stays")
    assert(fm("déjà vu — fine") == "déjà vu — fine")
    // the map is injective both ways (the JDK REPLACE action maps the
    // five undefined CP1252 bytes to U+FFFD, which would alias five
    // targets to one spelling if not excluded)
    assert(mojibakePairs.map(_._1).distinct.size == mojibakePairs.size)
    assert(mojibakePairs.map(_._2).distinct.size == mojibakePairs.size)
    assert(mojibakePairs.size > 90, s"expected ~100 pairs, got ${mojibakePairs.size}")
  }

  test("redactPii/luhnValid16: real PII phrases redacted; Luhn separates valid from shaped") {
    def rp(t: String): String = one[String](redactPii($"text"), t)
    assert(rp("mail me at jo.doe+x@mail.example.org today") ==
      "mail me at <EMAIL> today")
    assert(rp("call +1-555-867-5309 or ping 192.168.1.254 now") ==
      "call <PHONE> or ping <IP> now")
    assert(rp("card 4532015112830366 on file") == "card <CARD> on file")
    // ordering: the email rule consumes its digits before the card rule
    assert(rp("a1234567890123456b@x.io") == "<EMAIL>")
    assert(rp("nothing sensitive here") == "nothing sensitive here")
    // Luhn: 4532015112830366 is valid; flip the last digit and it isn't
    def lv(c: String): Boolean = one[Boolean](luhnValid16($"text"), c)
    assert(lv("4532015112830366"))
    assert(!lv("4532015112830367"))
    assert(lv("0000000000000000"))
  }

  test("fix_mojibake / redact_pii SQL doors: equal the Column API on real phrases") {
    val phrases = Seq(
      "donâ€™t â€œquoteâ€¦ naÃ¯ve Ã©tÃ©",
      "mail jo@x.io, card 4532015112830366, ip 10.1.2.3, +1-555-867-5309",
      "plain text stays put")
    val df = phrases.toDF("text")
    val viaSql = df.selectExpr("fix_mojibake(text) AS f", "redact_pii(text) AS r")
      .as[(String, String)].collect()
    val viaCol = df.select(fixMojibake($"text"), redactPii($"text"))
      .as[(String, String)].collect()
    assert(viaSql.sameElements(viaCol))
    assert(intercept[Exception] {
      spark.sql("SELECT fix_mojibake('a', 'b')")
    }.getMessage.contains("1 argument"))
  }

  test("scriptCounts: real Cyrillic/Greek/Arabic/Devanagari/CJK/FFFD code points counted per class") {
    // the synthetic corpus is all-Latin, so q239's oracle gates the
    // machinery on zeros; this is the non-zero evidence on real
    // non-Latin text (and the mojibake witness)
    val mixed = "abc привет " + // привет
      "αβ " +                                        // αβ
      "مرحبا " +                      // مرحبا
      "नमस्ते " +                // नमस्ते
      "你好世界 " +                            // 你好世界
      "x��y"
    val r = Seq(mixed).toDF("text")
      .select(scriptCounts($"text").as("sc"))
      .select($"sc.latin", $"sc.cyrillic", $"sc.greek", $"sc.arabic",
        $"sc.devanagari", $"sc.cjk", $"sc.replacement")
      .as[(Int, Int, Int, Int, Int, Int, Int)].head()
    assert(r == ((5, 6, 2, 5, 6, 4, 2)), r)
    // empty text: every class zero, never null
    val z = Seq("").toDF("text")
      .select(scriptCounts($"text").as("sc"))
      .select($"sc.latin", $"sc.replacement").as[(Int, Int)].head()
    assert(z == ((0, 0)))
  }

  test("urlNormalize: case/port/www/fragment/trailing-slash collapse; path case and query preserved") {
    def norm(u: String): String = Seq(u).toDF("u")
      .select(urlNormalize($"u")).as[String].head()
    // the full variant stack collapses to the canonical spelling
    assert(norm("HTTP://WWW.Host.Example.COM:80/p/3/#sec") ==
      "http://host.example.com/p/3")
    assert(norm("https://www.host.example.com:443/p/3") ==
      "https://host.example.com/p/3")
    // already-canonical input is a fixed point (idempotence)
    assert(norm("http://host.example.com/p/3") ==
      "http://host.example.com/p/3")
    assert(norm(norm("HTTPS://WWW.H.io:443/A/")) == norm("HTTPS://WWW.H.io:443/A/"))
    // the PATH keeps its case (case-sensitive per RFC 3986)...
    assert(norm("http://Host.com/CaseSensitive/Path") ==
      "http://host.com/CaseSensitive/Path")
    // ...non-default ports survive, and so do query strings, verbatim
    assert(norm("http://host.com:8080/x") == "http://host.com:8080/x")
    assert(norm("http://host.com/x?b=2&a=1") == "http://host.com/x?b=2&a=1")
    // a www-less host never loses its prefix-lookalike
    assert(norm("http://wwwhost.com/x") == "http://wwwhost.com/x")
    // :443 on http (or :80 on https) is NOT a default port — kept
    assert(norm("http://host.com:443/x") == "http://host.com:443/x")
    // a trailing slash inside QUERY DATA is not a path slash — the
    // trim must not collapse '?next=/' into '?next=' (distinct pages)
    assert(norm("http://h.io/p?next=/") == "http://h.io/p?next=/")
    assert(norm("http://h.io/p/?a=1") == "http://h.io/p/?a=1")
    // ...while a genuine trailing path slash still trims
    assert(norm("http://h.io/p/") == "http://h.io/p")
  }

  test("sitemapLocs: document order, whitespace trim, empty/locless bodies degrade to empty") {
    def locs(xml: String): Seq[String] = Seq(xml).toDF("x")
      .select(sitemapLocs($"x")).as[Seq[String]].head()
    assert(locs("<urlset><url><loc>http://a/1</loc></url>" +
      "<url><loc>\n  http://a/2 \t</loc></url></urlset>") ==
      Seq("http://a/1", "http://a/2"))
    assert(locs("<urlset></urlset>") == Seq.empty)
    assert(locs("") == Seq.empty)
    // non-greedy: two locs never merge into one spanning match
    assert(locs("<loc>u1</loc><lastmod>x</lastmod><loc>u2</loc>") ==
      Seq("u1", "u2"))
  }

  test("extractLinks: absolute kept, root-relative resolved, fragment/mailto/protocol-relative dropped") {
    def links(html: String): Seq[String] = Seq(html).toDF("h")
      .select(extractLinks($"h", lit("https://me.io")))
      .as[Seq[String]].head()
    assert(links(
      """<a href="http://a.io/x">1</a><a href='/p/2'>2</a>""" +
        """<a href="#top">3</a><a href="mailto:a@b.c">4</a>""" +
        """<a href="//cdn.io/x">5</a><a href="rel/path">6</a>""" +
        """<a class="z" href="/">7</a>""") ==
      Seq("http://a.io/x", "https://me.io/p/2",
        // page-relative resolves against the root when the page URL
        // carries no path
        "https://me.io/rel/path", "https://me.io/"))
    assert(links("<p>no anchors</p>") == Seq.empty)
  }

  test("extractLinks: page-relative and ../ resolve against the page's directory; deeper dots drop") {
    def links(html: String): Seq[String] = Seq(html).toDF("h")
      .select(extractLinks($"h", lit("https://me.io/a/b/page.html")))
      .as[Seq[String]].head()
    assert(links(
      """<a href="next.html">1</a><a href="./same.html">2</a>""" +
        """<a href="../up.html">3</a><a href="../../top.html">4</a>""" +
        """<a href="..">5</a><a href=".">6</a>""" +
        """<a href="../">7</a><a href="/root.html">8</a>""") ==
      Seq("https://me.io/a/b/next.html", "https://me.io/a/b/same.html",
        "https://me.io/a/up.html",
        // ../../ is past the one-level contract -> dropped; bare
        // '.'/'..' dropped; '../' alone is the parent directory
        "https://me.io/a/",
        "https://me.io/root.html"))
    // one level up from a root-level page clamps at the root
    def rootLinks(html: String): Seq[String] = Seq(html).toDF("h")
      .select(extractLinks($"h", lit("https://me.io/page.html")))
      .as[Seq[String]].head()
    assert(rootLinks("""<a href="../x.html">u</a>""") ==
      Seq("https://me.io/x.html"))
  }

  test("extractAnchors: href/text pair under one pattern, resolution matches extractLinks, nested markup drops whole") {
    def anchors(html: String, page: String): Seq[(String, String)] =
      Seq(html).toDF("h")
        .select(extractAnchors($"h", lit(page)).as("a"))
        .select(explode($"a").as("x"))
        .select($"x.url", $"x.text").as[(String, String)].collect().toSeq
    assert(anchors(
      """<a href="http://a.io/x">Best Deals</a>""" +
        """<a href='/p/2'>two words</a>""" +
        """<a href="#top">skip</a>""" +
        """<a href="rel.html">rel text</a>""" +
        """<a href="http://b.io/y"><b>nested</b></a>""" +
        """<a href="http://c.io/z"></a>""",
      "https://me.io/d/page.html") ==
      Seq(("http://a.io/x", "Best Deals"),
        ("https://me.io/p/2", "two words"),
        ("https://me.io/d/rel.html", "rel text"),
        // nested-markup anchor dropped WHOLE (never a mispaired
        // href/text); empty text survives with its target
        ("http://c.io/z", "")))
    // pairing never slips even when a dropped href sits between two
    // kept ones
    assert(anchors(
      """<a href="http://a.io/1">one</a><a href="mailto:x@y.z">m</a>""" +
        """<a href="http://a.io/2">two</a>""",
      "https://me.io") ==
      Seq(("http://a.io/1", "one"), ("http://a.io/2", "two")))
  }

  test("sitemapIndexLocs/sitemapUrlLocs split the two record types; flat extractor conflates them") {
    val index = "<sitemapindex><sitemap><lastmod>2024-01-01</lastmod>" +
      "<loc> https://a.io/sm1.xml </loc></sitemap>" +
      "<sitemap><loc>https://a.io/sm2.xml</loc></sitemap></sitemapindex>"
    val urlset = "<urlset><url><loc>https://a.io/p1</loc>" +
      "<changefreq>daily</changefreq></url>" +
      "<url><loc> https://a.io/p2 </loc></url></urlset>"
    def run(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
            xml: String): Seq[String] =
      Seq(xml).toDF("x").select(f($"x")).as[Seq[String]].head()
    assert(run(sitemapIndexLocs, index) ==
      Seq("https://a.io/sm1.xml", "https://a.io/sm2.xml"))
    assert(run(sitemapUrlLocs, index) == Seq.empty)
    assert(run(sitemapUrlLocs, urlset) ==
      Seq("https://a.io/p1", "https://a.io/p2"))
    assert(run(sitemapIndexLocs, urlset) == Seq.empty)
    // the confusion the split exists to prevent: the flat extractor
    // reads child SITEMAPS as if they were pages
    assert(run(sitemapLocs, index) ==
      Seq("https://a.io/sm1.xml", "https://a.io/sm2.xml"))
    assert(run(sitemapIndexLocs, "<p>not xml</p>") == Seq.empty)
    // the SQL doors expand into the identical chains
    Seq(index).toDF("x").createOrReplaceTempView("smfix")
    assert(spark.sql("SELECT sitemap_index_locs(x) FROM smfix")
      .as[Seq[String]].head() == run(sitemapIndexLocs, index))
    assert(spark.sql("SELECT sitemap_url_locs(x) FROM smfix")
      .as[Seq[String]].head() == Seq.empty)
    val bad = intercept[Exception] {
      spark.sql("SELECT sitemap_index_locs(x, x) FROM smfix").collect()
    }
    assert(bad.getMessage.contains("exactly 1 argument"))
  }

  test("extract_anchors / extract_links SQL doors equal the Column API; arity refused") {
    Seq(("""<a href="http://a.io/x">one two</a><a href="rel.html">r</a>""",
      "https://me.io/d/page.html")).toDF("h", "p")
      .createOrReplaceTempView("anchfix")
    val viaSql = spark.sql(
      """SELECT explode(extract_anchors(h, p)) AS a FROM anchfix""")
      .select($"a.url", $"a.text").as[(String, String)].collect().toSeq
    val direct = Seq(("""<a href="http://a.io/x">one two</a><a href="rel.html">r</a>""",
      "https://me.io/d/page.html")).toDF("h", "p")
      .select(explode(extractAnchors($"h", $"p")).as("a"))
      .select($"a.url", $"a.text").as[(String, String)].collect().toSeq
    assert(viaSql == direct && direct.nonEmpty)
    val links = spark.sql(
      """SELECT explode(extract_links(h, p)) AS u FROM anchfix""")
      .as[String].collect().toSeq
    assert(links == Seq("http://a.io/x", "https://me.io/d/rel.html"))
    val bad = intercept[Exception] {
      spark.sql("SELECT extract_anchors(h) FROM anchfix").collect()
    }
    assert(bad.getMessage.contains("expects (html, page_url)"))
  }

  test("htmlCharset: both meta forms sniff, first declaration wins, case folds, absent is NULL") {
    def sniff(html: String): Option[String] = Seq(html).toDF("h")
      .select(htmlCharset($"h")).as[Option[String]].head()
    assert(sniff("""<head><meta charset="UTF-8"></head>""") ==
      Some("utf-8"))
    assert(sniff("<meta charset=gb2312>") == Some("gb2312"))
    assert(sniff("""<meta http-equiv="Content-Type" """ +
      """content="text/html; charset=ISO-8859-1">""") ==
      Some("iso-8859-1"))
    // first declaration wins when several appear
    assert(sniff("""<meta charset='a-1'><meta charset='b-2'>""") ==
      Some("a-1"))
    assert(sniff("<p>no meta here</p>") == None)
  }

  test("extractCanonical: both attribute orders, relative resolution, unquoted rel, first wins, junk schemes drop") {
    def canon(html: String): Option[String] =
      Seq((html, "https://h.io/dir/page.html")).toDF("h", "p")
        .select(extractCanonical($"h", $"p")).as[Option[String]].head()
    assert(canon("<link rel=\"canonical\" href=\"https://c.io/x\">")
      == Some("https://c.io/x"))
    assert(canon("<link href=\"https://c.io/y\" rel=\"canonical\">")
      == Some("https://c.io/y"))
    assert(canon("<link rel=canonical href=\"/z\">")
      == Some("https://h.io/z"))          // root-relative
    assert(canon("<link rel=\"canonical\" href=\"other.html\">")
      == Some("https://h.io/dir/other.html")) // page-relative
    assert(canon("<link rel=\"stylesheet\" href=\"/css\">") == None)
    assert(canon("<p>no head</p>") == None)
    // rel-first declaration wins over a later href-first one
    assert(canon("<link rel=\"canonical\" href=\"https://c.io/first\">" +
      "<link href=\"https://c.io/second\" rel=\"canonical\">")
      == Some("https://c.io/first"))
    // unresolvable target (other scheme) → NULL, never garbage
    assert(canon("<link rel=\"canonical\" href=\"mailto:x@y.z\">") == None)
    // the dedup key falls back to the page's own normalized URL
    val key = Seq(("<p>none</p>", "HTTPS://h.io:443/a?utm=1#f"))
      .toDF("h", "p").select(canonicalKey($"h", $"p")).as[String].head()
    assert(key == "https://h.io/a?utm=1")
  }

  test("sitemapUrlEntries: loc/lastmod/changefreq per entry, tag order free, absent metadata NULLs, locless entries drop") {
    val xml = "<urlset>" +
      "<url><loc> https://a.io/p1 </loc><lastmod>2024-02-01</lastmod>" +
      "<changefreq>daily</changefreq></url>" +
      "<url><changefreq>weekly</changefreq><loc>https://a.io/p2</loc>" +
      "</url>" +
      "<url><lastmod>2024-01-01</lastmod></url>" + // no loc: drops
      "<url><loc>https://a.io/p3</loc></url></urlset>"
    val got = one[Seq[(String, Option[String], Option[String])]](
      sitemapUrlEntries($"text"), xml)
    assert(got == Seq(
      ("https://a.io/p1", Some("2024-02-01"), Some("daily")),
      ("https://a.io/p2", None, Some("weekly")),
      ("https://a.io/p3", None, None)), got.toString)
    // the SQL door (bridge) agrees
    val viaSql = spark.sql("SELECT sitemap_url_entries('" + xml + "')")
      .as[Seq[(String, Option[String], Option[String])]].head()
    assert(viaSql == got)
  }

  test("changefreqTtl: hint scaling off the base TTL — hand-computed") {
    val cases = Seq("always" -> 2L, "hourly" -> 2L, "daily" -> 5L,
      "weekly" -> 10L, "monthly" -> 20L, "yearly" -> 40L,
      "never" -> 1000000000L, "garbage" -> 10L)
    for ((cf, want) <- cases)
      assert(one[Long](changefreqTtl(lit(cf), lit(10L)), "x") == want,
        s"$cf")
    // NULL changefreq (no hint) falls back to the base
    assert(one[Long](changefreqTtl(lit(null).cast("string"), lit(10L)),
      "x") == 10L)
    // the quarter/half floors never reach 0
    assert(one[Long](changefreqTtl(lit("always"), lit(1L)), "x") == 1L)
  }

  test("htmlBlocks: jusText-shaped verdicts — nav/heading/promo/footer bad, article good; script content never leaks") {
    val html = "<html><head><title>T</title><script>var shouldnotleak=1;" +
      "</script><style>.x{color:red}</style></head><body>" +
      "<!-- comment noise -->" +
      "<nav><a href=\"/\">Home</a> <a href=\"/p\">Products</a> " +
      "<a href=\"/a\">About</a> <a href=\"/c\">Contact</a></nav>" +
      "<h1>Catalog update</h1>" +
      "<p>the quick brown fox jumps over a lazy dog in the sunny " +
      "meadow and it was a fine day for all of them</p>" +
      "<div class=\"promo\"><a href=\"/buy\">Buy now</a> " +
      "<a href=\"/deal\">Big deal</a> limited offer</div>" +
      "<footer>Copyright 2024 Example Corp All rights reserved" +
      "</footer></body></html>"
    val rows = one[Seq[(String, Long, Long, Long, Long, Boolean)]](
      htmlBlocks($"text"), html)
    assert(!rows.exists(_._1.contains("shouldnotleak")))
    assert(!rows.exists(_._1.contains("color:red")))
    assert(!rows.exists(_._1.contains("comment noise")))
    val byText = rows.map(r => r._1.split(" ").head -> r).toMap
    // nav: 4 words (< 5) AND link-dense — bad on both counts
    assert(byText("Home")._6 == false)
    assert(byText("Home")._4 > 333333L, s"nav link_ppm ${byText("Home")._4}")
    // heading: too short
    assert(byText("Catalog")._6 == false)
    // article: stopword-dense prose, no links — good
    val art = rows.find(_._1.startsWith("the quick")).get
    assert(art._6, s"article $art")
    assert(art._4 == 0L && art._5 >= 30000L)
    // promo: half its chars are anchor text — bad
    assert(byText("Buy")._6 == false)
    assert(byText("Buy")._4 == 500000L, s"promo link_ppm ${byText("Buy")._4}")
    // footer: zero stopwords — bad despite length
    assert(byText("Copyright")._6 == false && byText("Copyright")._3 >= 5L)
    // extraction keeps exactly the article
    assert(one[String](mainContent($"text"), html)
      == "the quick brown fox jumps over a lazy dog in the sunny " +
        "meadow and it was a fine day for all of them")
  }

  test("htmlBlocks: multi-block articles keep document order in mainContent; empty html degrades") {
    val html = "<p>the first part of it was a good one for all of us " +
      "to see</p><ul><li><a href=\"/x\">x</a></li></ul>" +
      "<p>and then the second part of it was also a fine one to read</p>"
    val got = one[String](mainContent($"text"), html)
    assert(got == "the first part of it was a good one for all of us " +
      "to see\nand then the second part of it was also a fine one to read")
    assert(one[Seq[(String, Long, Long, Long, Long, Boolean)]](
      htmlBlocks($"text"), "").isEmpty)
    assert(one[String](mainContent($"text"), "") == "")
  }

  test("html_blocks / main_content SQL doors equal the Column API; arity refused") {
    val html = "<nav><a href=\"/\">Home</a> <a href=\"/p\">P</a> " +
      "<a href=\"/q\">Q</a></nav><p>the cat sat on a mat and it was " +
      "happy for the rest of the day</p>"
    val df = Seq(html).toDF("h")
    df.createOrReplaceTempView("mc_door_spec")
    val viaSql = spark.sql(
      "SELECT main_content(h) AS m, size(html_blocks(h)) AS n " +
        "FROM mc_door_spec").as[(String, Int)].head()
    val viaCol = df.select(mainContent($"h"),
      size(htmlBlocks($"h"))).as[(String, Int)].head()
    assert(viaSql == viaCol, s"sql $viaSql vs col $viaCol")
    intercept[Exception] { spark.sql("SELECT main_content('a', 'b')") }
    intercept[Exception] { spark.sql("SELECT html_blocks()") }
  }

  test("registeredDomain: suffix heuristic — hand-computed") {
    def rd(h: String): String = Seq(h).toDF("h")
      .select(registeredDomain($"h")).as[String].head()
    assert(rd("news.bbc.co.uk") == "bbc.co.uk")
    assert(rd("www.a.b.example.com") == "example.com")
    assert(rd("example.com") == "example.com")
    assert(rd("deep.sub.x.com.au") == "x.com.au")
    // a bare suffix (or shorter) passes through unchanged
    assert(rd("co.uk") == "co.uk")
    assert(rd("localhost") == "localhost")
    // three-label host whose last two are NOT a known suffix
    assert(rd("a.github.io") == "github.io")
  }

  test("surtKey: host reversal, port, case-fold, query-param sort — hand-computed") {
    def k(u: String): String = Seq(u).toDF("u")
      .select(surtKey($"u")).as[String].head()
    // input contract: already-normalized URLs
    assert(k("http://example.com/path") == "com,example)/path")
    assert(k("https://a.b.example.co.uk/") == "uk,co,example,b,a)/")
    // non-default port rides between host and ')'
    assert(k("http://h.io:8080/x") == "io,h:8080)/x")
    // path case-folds (the CDX lookup key is case-insensitive; the
    // frontier key urlNormalize keeps case — deliberately different)
    assert(k("http://h.io/Dir/Page") == "io,h)/dir/page")
    // query params sort so ?b&a and ?a&b are one capture
    assert(k("http://h.io/p?b=2&a=1") == "io,h)/p?a=1&b=2")
    assert(k("http://h.io/p?a=1&b=2") == "io,h)/p?a=1&b=2")
    // empty path renders the root
    assert(k("http://h.io") == "io,h)/")
    // normalize → surt composition collapses spelling variants
    def nk(u: String): String = Seq(u).toDF("u")
      .select(surtKey(urlNormalize($"u"))).as[String].head()
    assert(nk("HTTP://WWW.Example.COM:80/A/b") == "com,example)/a/b")
    assert(nk("http://example.com/A/b") == "com,example)/a/b")
  }

  test("surt_key SQL door equals the Column API; arity refused") {
    val urls = Seq("http://example.com/path", "http://h.io:8080/x",
      "http://h.io/Dir/Page?b=2&a=1", "http://h.io").toDF("u")
    urls.createOrReplaceTempView("surt_door_spec")
    val viaSql = spark.sql(
      "SELECT surt_key(u) FROM surt_door_spec ORDER BY u")
      .as[String].collect().toSeq
    val direct = urls.select(surtKey($"u").as("k"))
      .orderBy($"u").as[String].collect().toSeq
    assert(viaSql == direct && direct.nonEmpty)
    val e = intercept[Exception] {
      spark.sql("SELECT surt_key('a', 'b')").collect()
    }
    assert(e.getMessage.contains("exactly 1 argument"),
      e.getMessage.take(200))
  }

  test("url_normalize SQL door equals the Column API; arity refused") {
    val urls = Seq("HTTP://WWW.Host.COM:80/A/b/#f",
      "https://www.h.io:443/x?q=1", "http://plain.org/p",
      "not-a-url").toDF("u")
    urls.createOrReplaceTempView("url_door_spec")
    val viaSql = spark.sql(
      "SELECT url_normalize(u) FROM url_door_spec ORDER BY u")
      .as[String].collect().toSeq
    val direct = urls.select(urlNormalize($"u").as("n"))
      .orderBy($"u").as[String].collect().toSeq
    assert(viaSql == direct && direct.nonEmpty)
    val e = intercept[Exception] {
      spark.sql("SELECT url_normalize('a', 'b')").collect()
    }
    assert(e.getMessage.contains("exactly 1 argument"),
      e.getMessage.take(200))
  }
}
