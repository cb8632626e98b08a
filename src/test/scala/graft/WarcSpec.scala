package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Warc

/** The WARC seam: record render/parse round trip, header recovery,
  * and the len_ok integrity flag on every documented failure mode. */
class WarcSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def parse(blob: String) =
    Warc.parseRecords(Seq(blob).toDF("blob"), "blob")
      .select($"uri", $"content_length", $"payload", $"len_ok")
      .as[(String, Option[Long], String, Boolean)].collect().toSeq

  test("round trip: multi-record blob recovers every uri/payload, len_ok everywhere") {
    val docs = Seq(("http://a/1", "hello world"),
      ("http://a/2", "second doc"), ("http://a/3", ""))
    val blob = docs.map { case (u, p) =>
      s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $u\r\n" +
        s"Content-Length: ${p.length}\r\n\r\n$p"
    }.mkString("\r\n\r\n")
    // note: the empty-payload record parses only when not last (a
    // trailing empty payload leaves nothing after the final \r\n\r\n);
    // order puts it mid-blob via doc 3 being re-appended with content
    val got = parse(blob)
    assert(got.size == 3, got.toString)
    assert(got.map(_._1) == docs.map(_._1))
    assert(got.map(_._3) == docs.map(_._2))
    assert(got.forall(_._4), s"len_ok must hold everywhere: $got")
    // the render side produces exactly this framing
    val rendered = Seq(("http://a/1", "hello world"))
      .toDF("uri", "payload")
      .select(Warc.record($"uri", $"payload")).as[String].head()
    assert(rendered == blob.split("\r\n\r\nWARC/1\\.0\r\n")(0))
  }

  test("integrity flag: truncated payload, missing Content-Length, boundary-in-payload all surface as len_ok=false") {
    // declared 100, delivered 9 — the truncated-transfer case
    val truncated = "WARC/1.0\r\nWARC-Target-URI: http://t/1\r\n" +
      "Content-Length: 100\r\n\r\nshort doc"
    val t = parse(truncated)
    assert(t.size == 1 && !t.head._4 && t.head._2.contains(100L))
    // header missing entirely — content_length null, flagged
    val headerless = "WARC/1.0\r\nWARC-Target-URI: http://t/2\r\n" +
      "X-Other: y\r\n\r\npayload here"
    val h = parse(headerless)
    assert(h.size == 1 && !h.head._4 && h.head._2.isEmpty)
    // the documented caveat: a payload containing the exact boundary
    // sequence mis-splits — and the flag CATCHES it (the first
    // fragment's recovered payload is shorter than declared)
    val evil = "inner" + "\r\n\r\nWARC/1.0\r\n" + "tail"
    val blob = s"WARC/1.0\r\nWARC-Target-URI: http://t/3\r\n" +
      s"Content-Length: ${evil.length}\r\n\r\n$evil"
    val e = parse(blob)
    assert(e.exists(!_._4),
      s"mis-split must be flagged, not silent: $e")
  }

  test("len_ok counts OCTETS: multibyte payloads round-trip clean; a char-count Content-Length is flagged") {
    val p = "héllo • wörld" // 13 chars, 17 UTF-8 octets
    assert(p.length == 13 && p.getBytes("UTF-8").length == 17)
    // writer emits octets -> parser agrees
    val rendered = Seq(("http://m/1", p)).toDF("uri", "payload")
      .select(Warc.record($"uri", $"payload")).as[String].head()
    assert(rendered.contains("Content-Length: 17"), rendered)
    val ok = parse(rendered)
    assert(ok.size == 1 && ok.head._4, ok.toString)
    // a record declaring the CHARACTER count is the corruption the
    // octet contract exists to catch — flagged, not silently passed
    val charLen = "WARC/1.0\r\nWARC-Target-URI: http://m/2\r\n" +
      s"Content-Length: ${p.length}\r\n\r\n$p"
    val bad = parse(charLen)
    assert(bad.size == 1 && !bad.head._4, bad.toString)
  }

  test("httpSplit: status/content-type/charset/body recovered; non-HTTP payloads fail loud with NULLs") {
    def split(payload: String) =
      Warc.httpSplit(Seq(payload).toDF("payload"), "payload")
        .select($"http_status", $"content_type", $"charset", $"body")
        .as[(Option[Int], Option[String], Option[String],
          Option[String])].head()
    val msg = "HTTP/1.1 200 OK\r\nServer: x\r\n" +
      "Content-Type: Text/HTML; charset=UTF-8\r\n" +
      "Content-Length: 11\r\n\r\nhello\r\nbody"
    assert(split(msg) == ((Some(200), Some("text/html"), Some("utf-8"),
      Some("hello\r\nbody")))) // body keeps ITS OWN CRLFs intact
    // header casing folds; params beyond charset ignored; HTTP/2-ish
    // one-digit versions parse
    val msg2 = "HTTP/2 404 Not Found\r\ncontent-type: text/plain\r\n" +
      "\r\nmissing"
    assert(split(msg2) == ((Some(404), Some("text/plain"), None,
      Some("missing"))))
    // a Content-Type buried in the BODY must not leak into the split
    val msg3 = "HTTP/1.1 200 S\r\nX: y\r\n\r\n" +
      "Content-Type: evil/fake\r\nbody text"
    val s3 = split(msg3)
    assert(s3._1 == Some(200) && s3._2.isEmpty,
      s"header parse must stop at the blank line: $s3")
    // not an HTTP message at all: everything NULL (fail-loud — the
    // caller opts into pass-through with coalesce(body, payload))
    assert(split("just a raw fixture payload") ==
      ((None, None, None, None)))
  }

  test("warc_type: interleaved request/response/metadata records keep their types; headerless parses NULL") {
    val mk = (t: String, u: String, p: String) =>
      s"WARC/1.0\r\nWARC-Type: $t\r\nWARC-Target-URI: $u\r\n" +
        s"Content-Length: ${p.getBytes("UTF-8").length}\r\n\r\n$p"
    val blob = Seq(
      mk("request", "http://t/1", "GET /1 HTTP/1.1\r\nHost: t"),
      mk("response", "http://t/1", "doc body one"),
      mk("metadata", "http://t/1", "fetchTimeMs: 9"),
      "WARC/1.0\r\nWARC-Target-URI: http://t/2\r\n" +
        "Content-Length: 4\r\n\r\nuntyped".take(200))
      .mkString("\r\n\r\n")
    val got = Warc.parseRecords(Seq(blob).toDF("blob"), "blob")
      .select($"warc_type", $"uri")
      .as[(Option[String], String)].collect().toSeq
    assert(got == Seq(
      (Some("request"), "http://t/1"), (Some("response"), "http://t/1"),
      (Some("metadata"), "http://t/1"), (None, "http://t/2")),
      got.toString)
  }

  test("payload digest: header renders only when supplied, extracts verbatim, NULL when absent") {
    val rows = Seq(("http://d/1", "body one", "md5:abc123"),
      ("http://d/2", "body two", ""))
      .toDF("uri", "payload", "dg")
    val blob = rows
      .select(Warc.record($"uri", $"payload", lit("response"), $"dg"))
      .as[String].collect().mkString("\r\n\r\n")
    val got = Warc.parseRecords(Seq(blob).toDF("blob"), "blob")
      .select($"uri", $"payload_digest", $"len_ok")
      .as[(String, Option[String], Boolean)].collect().toSeq
    assert(got == Seq(("http://d/1", Some("md5:abc123"), true),
      ("http://d/2", None, true)), got.toString)
  }

  test("httpSplit: Location header surfaces for redirect chasing, absent elsewhere") {
    def split(payload: String) =
      Warc.httpSplit(Seq(payload).toDF("payload"), "payload")
        .select($"http_status", $"location")
        .as[(Option[Int], Option[String])].head()
    val redirect = "HTTP/1.1 301 S\r\nLocation: https://n.io/new\r\n" +
      "Content-Length: 0\r\n\r\n"
    assert(split(redirect) == ((Some(301), Some("https://n.io/new"))))
    val plain = "HTTP/1.1 200 S\r\nContent-Type: text/html\r\n\r\nbody"
    assert(split(plain) == ((Some(200), None)))
    // a 'Location:' in the BODY never leaks into the header split
    val evil = "HTTP/1.1 200 S\r\nX: y\r\n\r\nLocation: /fake"
    assert(split(evil) == ((Some(200), None)))
  }

  test("httpSplit: ETag/Last-Modified validators surface verbatim; never leak from the body") {
    def split(payload: String) =
      Warc.httpSplit(Seq(payload).toDF("payload"), "payload")
        .select($"etag", $"last_modified")
        .as[(Option[String], Option[String])].head()
    val full = "HTTP/1.1 200 S\r\nETag: \"abc123\"\r\n" +
      "Last-Modified: Wed, 01 Jan 2025 00:00:00 GMT\r\n" +
      "Content-Length: 4\r\n\r\nbody"
    assert(split(full) == ((Some("\"abc123\""),
      Some("Wed, 01 Jan 2025 00:00:00 GMT"))))
    val none = "HTTP/1.1 200 S\r\nContent-Length: 4\r\n\r\nbody"
    assert(split(none) == ((None, None)))
    // an 'ETag:' line in the BODY never reaches the header split
    val evil = "HTTP/1.1 200 S\r\nX: y\r\n\r\nETag: \"fake\""
    assert(split(evil) == ((None, None)))
  }

  test("parseRecordsBinary: Content-Length-driven walk recovers a boundary-carrying payload intact — the relational tier's caveat CLOSED") {
    val evil = "inner" + "\r\n\r\nWARC/1.0\r\n" + "tail"
    val blob = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Target-URI: http://b/1\r\n" +
      s"Content-Length: ${evil.getBytes("UTF-8").length}\r\n\r\n$evil" +
      "\r\n\r\n" +
      s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Target-URI: http://b/2\r\nContent-Length: 4\r\n\r\nnext")
      .getBytes("UTF-8")
    val got = Warc.parseRecordsBinary(
        Seq(("x", blob)).toDF("id", "bytes"), "bytes", "id")
      .select($"uri", $"payload_bytes", $"len_ok")
      .as[(String, Array[Byte], Boolean)].collect().toSeq
    assert(got.size == 2, got.toString)
    assert(new String(got(0)._2, "UTF-8") == evil && got(0)._3,
      "the byte walker must recover the boundary-carrying payload")
    assert(new String(got(1)._2, "UTF-8") == "next" && got(1)._3)
  }

  test("parseRecordsBinary: truncated tail flagged with what exists; missing Content-Length falls back flagged") {
    val truncated = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://b/3\r\nContent-Length: 100\r\n\r\nshort")
      .getBytes("UTF-8")
    val t = Warc.parseRecordsBinary(
        Seq(("x", truncated)).toDF("id", "bytes"), "bytes", "id")
      .select($"content_length", $"payload_bytes", $"len_ok")
      .as[(Option[Long], Array[Byte], Boolean)].collect().toSeq
    assert(t.size == 1 && t.head._1 == Some(100L) && !t.head._3)
    assert(new String(t.head._2, "UTF-8") == "short")
    val noLen = ("WARC/1.0\r\nWARC-Target-URI: http://b/4\r\n" +
      "X-Other: y\r\n\r\npayload here\r\n\r\nWARC/1.0\r\n" +
      "WARC-Target-URI: http://b/5\r\nContent-Length: 2\r\n\r\nok")
      .getBytes("UTF-8")
    val n = Warc.parseRecordsBinary(
        Seq(("x", noLen)).toDF("id", "bytes"), "bytes", "id")
      .select($"uri", $"content_length", $"len_ok")
      .as[(String, Option[Long], Boolean)].collect().toSeq
    assert(n.map(r => (r._1, r._2.isEmpty, r._3)) ==
      Seq(("http://b/4", true, false), ("http://b/5", false, true)),
      n.toString)
  }

  test("parseRecordsBinary: offset/rlength are byte-exact seek coordinates — slicing the blob at (offset, rlength) re-yields each record") {
    // multibyte payload: ü is 2 octets, so a char-based offset drifts
    val p1 = "pay ün1"
    val rec1 = s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Target-URI: http://b/1\r\n" +
      s"Content-Length: ${p1.getBytes("UTF-8").length}\r\n\r\n$p1"
    val rec2 = "WARC/1.0\r\nWARC-Target-URI: http://b/2\r\n" +
      "Content-Length: 4\r\n\r\nnext"
    val blob = (rec1 + "\r\n\r\n" + rec2).getBytes("UTF-8")
    val got = Warc.parseRecordsBinary(
        Seq(("x", blob)).toDF("id", "bytes"), "bytes", "id")
      .select($"uri", $"offset", $"rlength")
      .as[(String, Long, Long)].collect().toSeq
    val r1Len = rec1.getBytes("UTF-8").length.toLong
    assert(got == Seq(("http://b/1", 0L, r1Len),
      ("http://b/2", r1Len + 4, rec2.getBytes("UTF-8").length.toLong)),
      got.toString)
    // the coordinates actually seek: re-slicing the blob at each
    // (offset, rlength) reproduces the record byte-for-byte
    got.zip(Seq(rec1, rec2)).foreach { case ((_, off, rl), rec) =>
      assert(new String(blob, off.toInt, rl.toInt, "UTF-8") == rec)
    }
  }

  test("decodePayloads: latin-1 decodes under its label, unknown charsets fall back to UTF-8 replacement") {
    val latin = "café déjà"
    val rows = Seq(
      ("l1", latin.getBytes("ISO-8859-1"), "iso-8859-1"),
      ("u1", "plain utf-8 ü".getBytes("UTF-8"), null: String),
      ("b1", "text".getBytes("UTF-8"), "no-such-charset"))
      .toDF("id", "bytes", "cs")
    val got = Warc.decodePayloads(rows, "bytes", "cs", "id")
      .select($"id", $"text").as[(String, String)].collect().toMap
    assert(got("l1") == latin, got("l1"))
    assert(got("u1") == "plain utf-8 ü")
    assert(got("b1") == "text") // unsupported label -> utf-8 fallback
  }

  test("dechunkBatch: chunks reassemble (multibyte-exact), extensions ignored, malformed walks yield NULL") {
    def chunk(s: String): String =
      s"${s.getBytes("UTF-8").length.toHexString}\r\n$s\r\n"
    val body = chunk("hello ") + chunk("wörld") + "0\r\n\r\n"
    val ext = "6;name=v\r\nhello \r\n0\r\n\r\n" // chunk extension
    val bad = "ZZ\r\nnothex\r\n0\r\n\r\n"
    val cut = "64\r\ntoo short\r\n" // declared 0x64, delivered 9
    val got = Warc.dechunkBatch(
        Seq(("a", body), ("e", ext), ("b", bad), ("c", cut))
          .toDF("id", "body"), "body", "id")
      .select($"id", $"dechunked")
      .as[(String, Option[String])].collect().toMap
    assert(got("a") == Some("hello wörld"), got.toString)
    assert(got("e") == Some("hello "), got.toString)
    assert(got("b").isEmpty && got("c").isEmpty, got.toString)
  }

  test("httpSplit: chunked flag from Transfer-Encoding, absent means false, non-HTTP means NULL") {
    def split(payload: String) =
      Warc.httpSplit(Seq(payload).toDF("payload"), "payload")
        .select($"chunked").as[Option[Boolean]].head()
    assert(split("HTTP/1.1 200 S\r\nTransfer-Encoding: chunked\r\n\r\nx")
      == Some(true))
    assert(split("HTTP/1.1 200 S\r\nContent-Type: text/html\r\n\r\nx")
      == Some(false))
    assert(split("no http head") == None)
  }

  private def gzipMembers(parts: Seq[String]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    parts.foreach { p =>
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(p.getBytes("UTF-8")); g.finish(); g.close()
    }
    out.toByteArray
  }

  test("gunzipBlobs: multi-member streams concatenate, corrupt bytes degrade to NULL") {
    val good = gzipMembers(Seq("part one|", "part two|", "part three"))
    val corrupt = "not gzip at all".getBytes("UTF-8")
    val got = Warc.gunzipBlobs(
        Seq(("g", good), ("c", corrupt)).toDF("id", "bytes"),
        "id", "bytes")
      .select($"id", $"blob").as[(String, Option[String])]
      .collect().toMap
    assert(got("g") == Some("part one|part two|part three"), got.toString)
    assert(got("c").isEmpty, got.toString)
  }

  test("decodeHttpBinary: chunked → gzip → charset compose in wire order; meta sniff only without a header charset") {
    def gz(b: Array[Byte]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(o)
      g.write(b); g.finish(); g.close(); o.toByteArray
    }
    def chunkBytes(b: Array[Byte]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      val mid = b.length / 2
      Seq(b.slice(0, mid), b.slice(mid, b.length)).foreach { part =>
        o.write(s"${part.length.toHexString}\r\n".getBytes("US-ASCII"))
        o.write(part); o.write("\r\n".getBytes("US-ASCII"))
      }
      o.write("0\r\n\r\n".getBytes("US-ASCII"))
      o.toByteArray
    }
    def msg(headers: String, body: Array[Byte]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(s"HTTP/1.1 200 S\r\n$headers\r\n\r\n"
        .getBytes("US-ASCII"))
      o.write(body); o.toByteArray
    }
    val latinDoc = "<meta charset=\"iso-8859-1\">café déjà vu"
    val rows = Seq(
      // outer chunked over inner gzip over latin-1 bytes; no header
      // charset -> the meta sniff (over the DECODED wire layers)
      // must find iso-8859-1
      ("full", msg("Content-Type: text/html\r\n" +
        "Transfer-Encoding: chunked\r\nContent-Encoding: gzip",
        chunkBytes(gz(latinDoc.getBytes("ISO-8859-1"))))),
      // header charset WINS over a contradicting meta tag
      ("hdr", msg("Content-Type: text/html; charset=UTF-8",
        "<meta charset=\"iso-8859-1\">plain ü".getBytes("UTF-8"))),
      // malformed gzip under a declared Content-Encoding -> NULL text
      ("bad", msg("Content-Encoding: gzip",
        "not gzip".getBytes("US-ASCII"))),
      ("raw", "no http head".getBytes("US-ASCII")))
      .toDF("id", "bytes")
    val got = Warc.decodeHttpBinary(rows, "bytes", "id")
      .select($"id", $"http_status", $"declared_charset", $"text")
      .as[(String, Option[Int], Option[String], Option[String])]
      .collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got("full") ==
      ((Some(200), Some("iso-8859-1"), Some(latinDoc))), got("full"))
    assert(got("hdr") ==
      ((Some(200), Some("utf-8"),
        Some("<meta charset=\"iso-8859-1\">plain ü"))), got("hdr"))
    assert(got("bad")._1 == Some(200) && got("bad")._3.isEmpty)
    assert(got("raw") == ((None, None, None)))
  }

  test("decodeHttpBinary: Content-Encoding deflate — zlib and raw forms both decode, chunked composes, corrupt streams NULL") {
    def deflate(b: Array[Byte], nowrap: Boolean): Array[Byte] = {
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, nowrap)
      d.setInput(b); d.finish()
      val o = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) { val n = d.deflate(buf); o.write(buf, 0, n) }
      d.end(); o.toByteArray
    }
    def chunkBytes(b: Array[Byte]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(s"${b.length.toHexString}\r\n".getBytes("US-ASCII"))
      o.write(b); o.write("\r\n0\r\n\r\n".getBytes("US-ASCII"))
      o.toByteArray
    }
    def msg(headers: String, body: Array[Byte]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(s"HTTP/1.1 200 S\r\n$headers\r\n\r\n".getBytes("US-ASCII"))
      o.write(body); o.toByteArray
    }
    val doc = "déjà inflated content"
    val rows = Seq(
      ("zlib", msg("Content-Type: text/html; charset=utf-8\r\n" +
        "Content-Encoding: deflate",
        deflate(doc.getBytes("UTF-8"), nowrap = false))),
      // raw DEFLATE under the same label — what certain servers send
      ("raw", msg("Content-Type: text/html; charset=utf-8\r\n" +
        "Content-Encoding: deflate",
        deflate(doc.getBytes("UTF-8"), nowrap = true))),
      // outer chunked over inner deflate — wire order composes
      ("chunked", msg("Content-Type: text/html; charset=utf-8\r\n" +
        "Transfer-Encoding: chunked\r\nContent-Encoding: deflate",
        chunkBytes(deflate(doc.getBytes("UTF-8"), nowrap = false)))),
      ("bad", msg("Content-Encoding: deflate",
        "not deflate at all".getBytes("US-ASCII"))))
      .toDF("id", "bytes")
    val got = Warc.decodeHttpBinary(rows, "bytes", "id")
      .select($"id", $"http_status", $"text")
      .as[(String, Option[Int], Option[String])]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got("zlib") == ((Some(200), Some(doc))), got("zlib"))
    assert(got("raw") == ((Some(200), Some(doc))), got("raw"))
    assert(got("chunked") == ((Some(200), Some(doc))), got("chunked"))
    assert(got("bad")._2.isEmpty, got("bad"))
    // the fixture helper round-trips through the decoder too
    val viaHelper = Warc.decodeHttpBinary(
      Warc.deflateHttpResponseBytes(
        Seq(("a", doc, false), ("b", doc, true))
          .toDF("id", "body", "nowrap"), "id", "body", "nowrap"),
      "bb", "id")
      .select($"id", $"text").as[(String, Option[String])]
      .collect().toMap
    assert(viaHelper == Map("a" -> Some(doc), "b" -> Some(doc)))
  }

  test("readWarcGz: a per-record-gzipped shard round-trips through parseRecords") {
    val docs = Seq(("http://z/1", "alpha body"), ("http://z/2", "beta"))
    // the Common Crawl layout: each RECORD is its own gzip member,
    // members separated so concatenation re-forms the record stream
    val members = docs.zipWithIndex.map { case ((u, p), i) =>
      val sep = if (i == 0) "" else "\r\n\r\n"
      sep + s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $u" +
        s"\r\nContent-Length: ${p.getBytes("UTF-8").length}\r\n\r\n$p"
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_warcgz")
    try {
      java.nio.file.Files.write(dir.resolve("s1.warc.gz"),
        gzipMembers(members))
      java.nio.file.Files.write(dir.resolve("ignored.txt"),
        "noise".getBytes("UTF-8")) // glob filter must skip this
      val got = Warc.readWarcGz(spark, dir.toString)
        .select($"uri", $"payload", $"len_ok")
        .as[(String, String, Boolean)].collect().toSeq.sortBy(_._1)
      assert(got == docs.map { case (u, p) => (u, p, true) }, got.toString)
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
    }
  }
}
