package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.AvroBlob
import graft.ext.AvroBlob.Rec

/** From-spec Avro object container: varint/zigzag layout pinned by
  * hand-derived bytes, codec paths, schema-order decoding, sync
  * verification, fail-fast corruption. */
class AvroBlobSpec extends AnyFunSuite {

  private val recs = Seq(
    Rec(0L, 0.0, ""), Rec(-1L, 1.5, "a"), Rec(64L, -2.25, "tag"),
    Rec(Long.MaxValue, 1e300, "x" * 50),
    Rec(Long.MinValue, -0.0, "né")) // UTF-8 multibyte

  test("roundtrip across null and deflate codecs, multi-block " +
    "containers, extreme longs, and multibyte strings") {
    for (deflate <- Seq(false, true); blocks <- Seq(1, 2, 5)) {
      val enc = AvroBlob.encode(recs, deflate, syncSeed = 7, blocks)
      assert(AvroBlob.decode(enc) == recs, s"deflate=$deflate")
    }
  }

  test("zigzag varint bytes match the spec examples: 0→00, -1→01, " +
    "1→02, 63→7e, 64→80 01") {
    // locate the rec_id varint structurally in a single-record
    // null-codec container: the LAST 16 bytes are the trailing sync;
    // before them the tag length 0x00, before that 8 zero double
    // bytes, before that the rec_id varint
    def varintOf(v: Long): Seq[Int] = {
      val base = AvroBlob.encode(Seq(Rec(v, 0.0, "")), deflate = false,
        syncSeed = 1, blocks = 1)
      val tagLenIdx = base.length - 17
      assert((base(tagLenIdx) & 0xff) == 0x00)
      val idEnd = tagLenIdx - 8
      // scan back over continuation bytes to the varint start
      var s = idEnd - 1
      while (s > 0 && (base(s - 1) & 0x80) != 0) s -= 1
      base.slice(s, idEnd).toSeq.map(_ & 0xff)
    }
    assert(varintOf(0L) == Seq(0x00))
    assert(varintOf(-1L) == Seq(0x01))
    assert(varintOf(1L) == Seq(0x02))
    assert(varintOf(63L) == Seq(0x7e))
    assert(varintOf(64L) == Seq(0x80, 0x01))
  }

  test("corruption fails by name: magic, sync mismatch, unsupported " +
    "codec, foreign schema, truncation") {
    val enc = AvroBlob.encode(recs, deflate = false, syncSeed = 3)
    def expectMsg(bytes: Array[Byte], word: String): Unit = {
      val msg = intercept[IllegalArgumentException](
        AvroBlob.decode(bytes)).getMessage
      assert(msg.toLowerCase.contains(word.toLowerCase), msg)
    }
    val badMagic = enc.clone(); badMagic(1) = 'X'
    expectMsg(badMagic, "magic")
    val badSync = enc.clone()
    badSync(badSync.length - 3) = (badSync(badSync.length - 3) ^ 0x7f).toByte
    expectMsg(badSync, "sync")
    expectMsg(enc.dropRight(20), "truncated")
    // a container advertising a codec we do not implement
    // (same-length name keeps the varint length prefix valid)
    val withCodec = AvroBlob.encode(recs, deflate = true, syncSeed = 3)
    val patched = new String(withCodec, "ISO-8859-1")
      .replaceFirst("deflate", "snappyy").getBytes("ISO-8859-1")
    expectMsg(patched, "codec")
    val foreign = new String(enc, "ISO-8859-1")
      .replaceFirst("rec_id", "oth_id").getBytes("ISO-8859-1")
    expectMsg(foreign, "schema")
  }
}
