package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.ZipBlob
import graft.ext.ZipBlob.Entry

/** ZIP codec: EOCD-first enumeration, stored/deflate roundtrips,
  * CRC verification, trailing comments, by-name corruption. (The
  * encoder was also cross-validated against java.util.zip and
  * Python's zipfile — both list, CRC-check, and extract these
  * archives byte-exactly.) */
class ZipBlobSpec extends AnyFunSuite {

  private val entries = Seq(
    Entry("a.txt", "hello world".getBytes("US-ASCII"), deflate = true),
    Entry("dir/b.bin",
      Array.tabulate[Byte](700)(i => (i % 251).toByte), deflate = true),
    Entry("stored.dat", Array.fill[Byte](64)(7), deflate = false),
    Entry("empty", Array.emptyByteArray, deflate = false))

  test("members roundtrip across stored/deflate, empty content, and " +
    "a trailing archive comment after the EOCD scan point") {
    val enc = ZipBlob.encode(entries)
    val dec = ZipBlob.decode(enc)
    assert(dec.map(_.name) == entries.map(_.name))
    entries.zip(dec).foreach { case (w, g) =>
      assert(g.size == w.content.length &&
        g.content.sameElements(w.content), w.name)
      assert(g.method == (if (w.deflate) 8L else 0L))
    }
    // trailing archive comment: append 6 bytes and patch the EOCD
    // comment-length field — the backward scan must still land on
    // the true EOCD
    val withComment = enc ++ "hi zip".getBytes("US-ASCII")
    withComment(enc.length - 22 + 20) = 6
    assert(ZipBlob.decode(withComment).map(_.name) ==
      entries.map(_.name))
  }

  test("corruption fails by name: flipped content byte → CRC, " +
    "bogus EOCD, truncation, unsupported method") {
    val enc = ZipBlob.encode(entries)
    def expectMsg(bytes: Array[Byte], word: String): Unit = {
      val msg = intercept[IllegalArgumentException](
        ZipBlob.decode(bytes)).getMessage
      assert(msg.toLowerCase.contains(word.toLowerCase), msg)
    }
    // flip a byte inside the THIRD member's stored data (locate its
    // name, data follows the 30-byte local header + name)
    val nameAt = new String(enc, "ISO-8859-1").indexOf("stored.dat")
    val bad = enc.clone()
    bad(nameAt + 10 + 3) = (bad(nameAt + 10 + 3) ^ 0x01).toByte
    expectMsg(bad, "CRC")
    expectMsg(enc.take(40), "end-of-central-directory")
    // method 12 (bzip2) in both central and local headers
    val one = ZipBlob.encode(Seq(Entry("x", Array[Byte](1, 2, 3),
      deflate = false)))
    val m = one.clone()
    // local header method at offset 8; central entry method at cd+10
    m(8) = 12
    val s = new String(m, "ISO-8859-1")
    val cd = s.indexOf("PK\u0001\u0002")
    m(cd + 10) = 12
    expectMsg(m, "method")
  }

  test("ZIP64 sentinels and >2^31 sizes fail by name, never wrap " +
    "negative through an Int (ADVICE r14)") {
    def expectMsg(bytes: Array[Byte], word: String): Unit = {
      val msg = intercept[IllegalArgumentException](
        ZipBlob.decode(bytes)).getMessage
      assert(msg.toLowerCase.contains(word.toLowerCase), msg)
    }
    val one = ZipBlob.encode(Seq(Entry("x", Array[Byte](1, 2, 3),
      deflate = false)))
    val cd = new String(one, "ISO-8859-1").indexOf("PK\u0001\u0002")
    // csize = 0xFFFFFFFF (the ZIP64 "see extra field" sentinel)
    val z64 = one.clone()
    for (i <- 0 until 4) z64(cd + 20 + i) = 0xff.toByte
    expectMsg(z64, "ZIP64")
    // csize = 0x80000000: wraps negative as an Int; before the fix
    // the bounds guard passed and copyOfRange threw a bare
    // IllegalArgumentException with no ZIP-named message
    val big = one.clone()
    big(cd + 20) = 0; big(cd + 21) = 0; big(cd + 22) = 0
    big(cd + 23) = 0x80.toByte
    expectMsg(big, "exceeds stream")
    // ZIP64 local-header offset sentinel
    val off64 = one.clone()
    for (i <- 0 until 4) off64(cd + 42 + i) = 0xff.toByte
    expectMsg(off64, "ZIP64")
  }
}
