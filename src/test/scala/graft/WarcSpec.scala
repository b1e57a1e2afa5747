package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Warc

/** WARC record walk: Content-Length framing over hostile bodies,
  * HTTP split, fail-fast corruption. */
class WarcSpec extends AnyFunSuite {

  test("bodies containing CRLFs, blank lines, and 'WARC/1.0' " +
    "strings parse intact — the walk is length-framed, not " +
    "delimiter-scanned") {
    val hostile = "line1\r\n\r\nWARC/1.0\r\nContent-Length: 0\r\nx"
    val blob = Warc.record("response", "http://a/b",
      Warc.httpResponse(200, "text/plain", hostile)) ++
      Warc.record("metadata", "", "k: v\r\n")
    val recs = Warc.parse(blob)
    assert(recs.length == 2)
    assert(recs(0).warc_type == "response")
    assert(recs(0).http_status == 200)
    assert(recs(0).body == hostile)
    assert(recs(1).warc_type == "metadata")
    assert(recs(1).body == "k: v\r\n")
  }

  test("HTTP split: status and Content-Type header extracted " +
    "case-insensitively; non-response records skip the HTTP layer") {
    val blob = Warc.record("response", "u",
      "HTTP/1.1 301 Moved\r\ncontent-type: a/b\r\n\r\nbody")
    val r = Warc.parse(blob).head
    assert(r.http_status == 301 && r.content_type == "a/b" &&
      r.body == "body")
  }

  test("corruption fails by name: bad version, missing " +
    "Content-Length, truncated payload, missing terminator") {
    def expectMsg(bytes: Array[Byte], word: String): Unit = {
      val msg = intercept[IllegalArgumentException](
        Warc.parse(bytes)).getMessage
      assert(msg.toLowerCase.contains(word.toLowerCase), msg)
    }
    val good = Warc.record("response", "u",
      Warc.httpResponse(200, "text/html", "<p>x</p>"))
    val badVer = good.clone(); badVer(5) = '2'
    expectMsg(badVer, "version")
    expectMsg(good.dropRight(10), "truncated")
    val noTerm = good.dropRight(4) ++ "XXXX".getBytes("ISO-8859-1")
    expectMsg(noTerm, "CRLFCRLF")
    val noLen = ("WARC/1.0\r\nWARC-Type: metadata\r\n\r\n" +
      "\r\n\r\n").getBytes("ISO-8859-1")
    expectMsg(noLen, "Content-Length")
  }
}
