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
}
