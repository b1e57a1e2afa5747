package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.AacScan

/** ADTS frame scanner: hand-built 7-byte headers straight from the
  * spec's bit layout, explicit frame-length walk, block-based
  * duration; corruption fails by name. */
class AacScanSpec extends AnyFunSuite {

  private def frame(sfi: Int, ch: Int, flen: Int, fullness: Int,
                    rdb: Int, fill: Int = 0xff): Array[Byte] = {
    val b = Array.fill[Byte](flen)(fill.toByte)
    b(0) = 0xff.toByte
    b(1) = 0xf1.toByte
    b(2) = ((1 << 6) | (sfi << 2) | (ch >> 2)).toByte
    b(3) = (((ch & 3) << 6) | ((flen >> 11) & 3)).toByte
    b(4) = ((flen >> 3) & 0xff).toByte
    b(5) = (((flen & 7) << 5) | ((fullness >> 6) & 0x1f)).toByte
    b(6) = (((fullness & 0x3f) << 2) | rdb).toByte
    b
  }

  test("frame walk over explicit lengths with false syncs in " +
    "payloads; blocks (not frames) drive the duration; VBR marker") {
    // 44100 Hz (sfi 4), stereo, frames of 100/2500/64 bytes with
    // 1, 2, 1 raw data blocks → 4 blocks = 4096 samples
    val s = frame(4, 2, 100, 0x7ff, 0) ++
      frame(4, 2, 2500, 0x123, 1) ++ frame(4, 2, 64, 0x456, 0)
    val m = AacScan.scan(s)
    assert(m.n_frames == 3 && m.sample_rate == 44100 && m.channels == 2)
    assert(m.n_blocks == 4)
    assert(m.duration_ms == 4L * 1024 * 1000 / 44100) // 92 ms
    assert(m.min_frame_len == 64 && m.max_frame_len == 2500)
    assert(m.vbr == 1 && m.total_bytes == 100 + 2500 + 64)
    // all-CBR fullness → vbr 0
    assert(AacScan.scan(frame(4, 1, 80, 0x123, 0)).vbr == 0)
  }

  test("corruption fails by name: lost sync, CRC headers, reserved " +
    "frequency index, undersized frame length, truncation, mixed " +
    "rates and channel configs") {
    def expectMsg(bytes: Array[Byte], word: String): Unit = {
      val msg = intercept[IllegalArgumentException](
        AacScan.scan(bytes)).getMessage
      assert(msg.toLowerCase.contains(word.toLowerCase), msg)
    }
    val good = frame(4, 2, 100, 0x7ff, 0)
    val lost = good.clone(); lost(1) = 0x0f
    expectMsg(lost, "sync")
    val crc = good.clone(); crc(1) = 0xf0.toByte // protection bit 0
    expectMsg(crc, "CRC")
    val badSfi = good.clone()
    badSfi(2) = ((1 << 6) | (13 << 2)).toByte
    expectMsg(badSfi, "reserved")
    val tiny = frame(4, 2, 100, 0, 0).take(7).clone()
    tiny(4) = 0; tiny(5) = (6 << 5).toByte // frame length 6 < header
    expectMsg(tiny, "< header")
    expectMsg(good.dropRight(10), "truncated")
    expectMsg(frame(4, 2, 100, 0, 0) ++ frame(5, 2, 100, 0, 0), "mixed")
    expectMsg(frame(4, 2, 100, 0, 0) ++ frame(4, 1, 100, 0, 0), "mixed")
  }
}
