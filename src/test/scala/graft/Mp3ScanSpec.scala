package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Mp3Scan

/** MP3 frame-header scanner: hand-built streams straight from the
  * ISO 11172-3 field layout, walked by the 144·bitrate/rate + padding
  * rule; corruption fails by name. */
class Mp3ScanSpec extends AnyFunSuite {

  /** One MPEG-1 Layer III frame: header + filler payload of the
    * spec length. fill=0xFF plants false syncs inside payloads. */
  private def frame(bidx: Int, ridx: Int, pad: Int,
                    fill: Int = 0xff): Array[Byte] = {
    val kbps = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160,
      192, 224, 256, 320)(bidx)
    val rate = Array(44100, 48000, 32000)(ridx)
    val len = 144000 * kbps / rate + pad
    val b = Array.fill[Byte](len)(fill.toByte)
    b(0) = 0xff.toByte
    b(1) = 0xfb.toByte
    b(2) = ((bidx << 4) | (ridx << 2) | (pad << 1)).toByte
    b(3) = 0xc0.toByte
    b
  }

  test("CBR stream: frame count, padding, duration, and byte total " +
    "from the spec walk, with false syncs in every payload") {
    // 128 kbps @ 44100: frame = 144000·128/44100 = 417 (+pad)
    val s = frame(9, 0, 0) ++ frame(9, 0, 1) ++ frame(9, 0, 0)
    val m = Mp3Scan.scan(s)
    assert(m.n_frames == 3 && m.sample_rate == 44100)
    assert(m.n_padded == 1)
    assert(m.min_kbps == 128 && m.max_kbps == 128 && m.cbr == 1)
    assert(m.duration_ms == 3L * 1152 * 1000 / 44100) // 78 ms
    assert(m.total_bytes == 417 + 418 + 417)
  }

  test("VBR stream across the bitrate table; ID3v2 syncsafe skip " +
    "(a tag body that itself contains 0xFF sync bytes)") {
    val tagBody = Array.fill[Byte](200)(0xff.toByte)
    // syncsafe 200 → 7-bit groups (0, 0, 1, 72)
    val tagHdr = "ID3".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0, 0, 1, 72)
    val s = tagHdr ++ tagBody ++ frame(1, 2, 0) ++ frame(14, 2, 1)
    val m = Mp3Scan.scan(s)
    assert(m.n_frames == 2 && m.sample_rate == 32000)
    assert(m.min_kbps == 32 && m.max_kbps == 320 && m.cbr == 0)
    assert(m.total_bytes == 10 + 200 + 144 + (1440 + 1))
  }

  test("corruption fails by name: lost sync, reserved rate, free " +
    "bitrate, truncated final frame, mixed rates, oversized tag") {
    val good = frame(9, 0, 0) ++ frame(9, 0, 0)
    def expectMsg(bytes: Array[Byte], word: String): Unit = {
      val msg = intercept[IllegalArgumentException](
        Mp3Scan.scan(bytes)).getMessage
      assert(msg.toLowerCase.contains(word.toLowerCase), msg)
    }
    val lost = good.clone(); lost(0) = 0x7f
    expectMsg(lost, "sync")
    val badRate = good.clone(); badRate(2) = (badRate(2) | 0x0c).toByte
    expectMsg(badRate, "reserved")
    val free = good.clone(); free(2) = (free(2) & 0x0f).toByte
    expectMsg(free, "bitrate index")
    expectMsg(good.dropRight(10), "truncated")
    expectMsg(frame(9, 0, 0) ++ frame(9, 1, 0), "mixed")
    expectMsg("ID3".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0x7f, 0x7f, 0x7f, 0x7f), "ID3v2")
  }
}
