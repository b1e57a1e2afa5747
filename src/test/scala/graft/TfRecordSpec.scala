package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.TfRecord
import graft.ext.TfRecord.Msg

/** TFRecord framing (masked CRC32C) + protobuf wire walk. */
class TfRecordSpec extends AnyFunSuite {

  private val msgs = Seq(
    Msg(0L, "", 0.0), Msg(127L, "hello", 1.5),
    Msg(128L, "x" * 300, -2.25), // varint + length boundary cases
    Msg(Long.MaxValue, "né", 1e300))

  test("records roundtrip through framing + wire format; both CRCs " +
    "verified; an unknown field is skipped by wire type") {
    val recs = msgs.map(TfRecord.encodeMsg)
    val dec = TfRecord.decode(TfRecord.encode(recs))
      .map(TfRecord.decodeMsg)
    assert(dec == msgs)
    // unknown field 9, length-delimited, between known fields
    val withUnknown = {
      val out = new java.io.ByteArrayOutputStream()
      out.write((9 << 3) | 2)
      out.write(3); out.write(1); out.write(2); out.write(3)
      val base = TfRecord.encodeMsg(Msg(5L, "ab", 0.5))
      out.write(base, 0, base.length)
      out.toByteArray
    }
    assert(TfRecord.decodeMsg(withUnknown) == Msg(5L, "ab", 0.5))
  }

  test("corruption fails by name: flipped data byte → data CRC, " +
    "flipped length byte → length CRC, truncation") {
    val enc = TfRecord.encode(msgs.map(TfRecord.encodeMsg))
    def expectMsg(bytes: Array[Byte], word: String): Unit = {
      val msg = intercept[IllegalArgumentException](
        TfRecord.decode(bytes)).getMessage
      assert(msg.toLowerCase.contains(word.toLowerCase), msg)
    }
    val badData = enc.clone(); badData(14) = (badData(14) ^ 1).toByte
    expectMsg(badData, "data CRC")
    val badLen = enc.clone(); badLen(2) = (badLen(2) ^ 1).toByte
    expectMsg(badLen, "length CRC")
    expectMsg(enc.dropRight(3), "truncated")
  }

  test("the masked CRC is the TFRecord mask, not raw CRC32C: a " +
    "known one-byte record pins the rotr15 + 0xa282ead8 arithmetic") {
    val one = TfRecord.encode(Seq(Array[Byte](0x61))) // "a"
    // data crc: crc32c("a") = 0xc1d04330; mask = rotr15 + 0xa282ead8
    val crc = 0xc1d04330L
    val expect = ((((crc >>> 15) | (crc << 17)) & 0xffffffffL) +
      0xa282ead8L) & 0xffffffffL
    val got = (one(one.length - 4) & 0xffL) |
      ((one(one.length - 3) & 0xffL) << 8) |
      ((one(one.length - 2) & 0xffL) << 16) |
      ((one(one.length - 1) & 0xffL) << 24)
    assert(got == expect,
      f"masked crc $got%08x != $expect%08x")
  }
}
