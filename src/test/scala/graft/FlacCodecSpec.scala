package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.FlacCodec

/** From-scratch FLAC codec: exact roundtrips across the whole
  * implemented subframe surface, and the three integrity layers
  * (header CRC-8, frame CRC-16, STREAMINFO MD5) actually firing. */
class FlacCodecSpec extends AnyFunSuite {

  private val noisy = Array.tabulate(700)(i =>
    ((i * 7919 + 13) % 65536) - 32768)

  test("fixed-predictor roundtrips are bit-exact for orders 0..4, " +
    "multi-frame with a short last frame") {
    for (k <- 0 to 4) {
      val enc = FlacCodec.encode(noisy, fixedOrder = k)
      assert(FlacCodec.decode(enc).sameElements(noisy), s"order $k")
    }
  }

  test("VERBATIM frames roundtrip; CONSTANT blocks compress to the " +
    "constant subframe and roundtrip") {
    val enc = FlacCodec.encode(noisy, fixedOrder = 1,
      forceVerbatim = _ % 2 == 0)
    assert(FlacCodec.decode(enc).sameElements(noisy))
    val flat = Array.fill(600)(-12345)
    val encFlat = FlacCodec.encode(flat)
    assert(FlacCodec.decode(encFlat).sameElements(flat))
    // 600 16-bit samples raw = 1200 bytes; three CONSTANT subframes
    // carry 3 × 2 bytes of payload — the stream must be far smaller
    assert(encFlat.length < 200, s"constant stream ${encFlat.length}B")
  }

  test("negative, boundary, and tiny inputs roundtrip") {
    for (s <- Seq(Array(-32768, 32767, 0, -1, 1), Array(42),
      Array.tabulate(256)(i => if (i % 2 == 0) -32768 else 32767)))
      assert(FlacCodec.decode(FlacCodec.encode(s)).sameElements(s))
  }

  test("corruption is caught by name: frame body → CRC/MD5, header " +
    "→ CRC-8, truncation → truncated") {
    val enc = FlacCodec.encode(noisy)
    // STREAMINFO is 4 (marker) + 4 + 34 bytes; frames start at 42.
    // Flip a byte deep inside the first frame's residual body.
    val bodyBad = enc.clone(); bodyBad(90) = (bodyBad(90) ^ 0x40).toByte
    val msg1 = intercept[IllegalArgumentException](
      FlacCodec.decode(bodyBad)).getMessage
    assert(msg1.contains("CRC") || msg1.contains("MD5") ||
      msg1.contains("FLAC"), msg1)
    // flip a bit in the first frame header's blocksize code region
    val hdrBad = enc.clone(); hdrBad(44) = (hdrBad(44) ^ 0x01).toByte
    val msg2 = intercept[IllegalArgumentException](
      FlacCodec.decode(hdrBad)).getMessage
    assert(msg2.contains("FLAC"), msg2)
    intercept[IllegalArgumentException](
      FlacCodec.decode(enc.take(enc.length - 30)))
    intercept[IllegalArgumentException](
      FlacCodec.decode("nope".getBytes("US-ASCII")))
  }

  test("stereo: mid/side, independent, and mixed assignments all " +
    "roundtrip bit-exactly, including odd L+R parities and extremes") {
    val l = Array.tabulate(700)(i => ((i * 7919 + 5) % 65536) - 32768)
    val r = Array.tabulate(700)(i => l(i) / 2 - (i % 7))
    for (ms <- Seq[Int => Boolean](_ => true, _ => false, _ % 2 == 0)) {
      val enc = FlacCodec.encodeStereo(l, r, fixedOrder = 2, midSide = ms)
      val (dl, dr) = FlacCodec.decodeStereo(enc)
      assert(dl.sameElements(l) && dr.sameElements(r))
    }
    // parity corners: (mid<<1)|(side&1) must restore odd sums, and
    // the 17-bit side must carry the full ±65535 range
    val le = Array(-32768, 32767, -32768, 1, 0)
    val re = Array(32767, -32768, -32768, 0, -1)
    val (el, er) = FlacCodec.decodeStereo(FlacCodec.encodeStereo(le, re))
    assert(el.sameElements(le) && er.sameElements(re))
  }

  test("channel-count contracts: the mono API rejects stereo streams " +
    "and vice versa, by name") {
    val mono = FlacCodec.encode(Array.tabulate(300)(i => i - 150))
    val st = FlacCodec.encodeStereo(Array.fill(300)(7), Array.fill(300)(9))
    assert(intercept[IllegalArgumentException](
      FlacCodec.decode(st)).getMessage.contains("decodeStereo"))
    assert(intercept[IllegalArgumentException](
      FlacCodec.decodeStereo(mono)).getMessage.contains("stereo"))
  }

  test("LPC roundtrips are bit-exact for orders 1..8 on noise and on " +
    "a smooth signal, and the stream really carries LPC subframes") {
    for (k <- Seq(1, 2, 3, 4, 5, 8)) {
      val enc = FlacCodec.encode(noisy, lpcOrder = k)
      assert(FlacCodec.decode(enc).sameElements(noisy), s"order $k")
    }
    val smooth = Array.tabulate(700)(i =>
      (20000 * math.sin(i * 0.1)).toInt + (i % 3))
    for (k <- Seq(2, 4, 8)) {
      val enc = FlacCodec.encode(smooth, lpcOrder = k)
      assert(FlacCodec.decode(enc).sameElements(smooth), s"order $k")
      // frames start at byte 42 (4 marker + 4 header + 34 STREAMINFO);
      // for a full 256-sample block the first subframe header byte is
      // 6 bytes in (2 sync/flags + 1 codes + 1 chan/ss + 1 frame num
      // + 1 CRC-8) and carries the subframe type in bits 6..1 — ≥ 32
      val stype = (enc(48) >> 1) & 0x3f
      assert(stype >= 32, s"expected LPC subframe, got type $stype")
    }
  }

  test("stereo LPC (mid/side and independent) roundtrips bit-exactly") {
    val l = Array.tabulate(700)(i =>
      (15000 * math.sin(i * 0.07)).toInt + (i % 5))
    val r = Array.tabulate(700)(i => l(i) / 2 - (i % 7))
    for (ms <- Seq[Int => Boolean](_ => true, _ => false, _ % 2 == 0)) {
      val enc = FlacCodec.encodeStereo(l, r, midSide = ms, lpcOrder = 4)
      val (dl, dr) = FlacCodec.decodeStereo(enc)
      assert(dl.sameElements(l) && dr.sameElements(r))
    }
  }

  /** Hand-author a one-frame mono LPC stream straight from the RFC
    * 9639 field layout: order 2, warmup (100, −50), coefficients
    * (3, −2) at the given precision code, the given 5-bit shift
    * field, rice parameter 1, residuals (5, −3, 0, 9). Everything is
    * written by a TEST-LOCAL bit writer so the assertion is
    * independent of the codec's own encoder. */
  private def buildLpcStream(expected: Array[Int], precRaw: Int,
                             shiftField: Int): Array[Byte] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var acc = 0; var nb = 0
    def bit(b: Int): Unit = {
      acc = (acc << 1) | (b & 1); nb += 1
      if (nb == 8) { buf += acc.toByte; acc = 0; nb = 0 }
    }
    def put(v: Long, w: Int): Unit =
      for (i <- (w - 1) to 0 by -1) bit(((v >> i) & 1L).toInt)
    def pad(): Unit = while (nb != 0) bit(0)
    buf ++= "fLaC".getBytes("US-ASCII")
    put(1, 1); put(0, 7); put(34, 24) // last block, STREAMINFO, len
    put(256, 16); put(256, 16); put(0, 24); put(0, 24)
    put(8000, 20); put(0, 3); put(15, 5); put(expected.length.toLong, 36)
    pad()
    val md = java.security.MessageDigest.getInstance("MD5")
    val bb = new Array[Byte](expected.length * 2)
    for (i <- expected.indices) {
      bb(2 * i) = (expected(i) & 0xff).toByte
      bb(2 * i + 1) = ((expected(i) >> 8) & 0xff).toByte
    }
    buf ++= md.digest(bb)
    val frameStart = buf.length
    put(0x3ffe, 14); put(0, 1); put(0, 1) // sync, reserved, fixed-bs
    put(7, 4); put(0, 4); put(0, 4); put(4, 3); put(0, 1)
    put(0, 8) // coded frame number 0
    put((expected.length - 1).toLong, 16)
    pad()
    buf += FlacCodec.crc8(buf.toArray, frameStart, buf.length).toByte
    put(0, 1); put(33, 6); put(0, 1) // LPC order 2 (type 32 + 1)
    put(100L & 0xffff, 16); put(-50L & 0xffff, 16) // warmup
    put(precRaw.toLong, 4); put(shiftField.toLong, 5)
    put(3, 4); put(-2L & 0xf, 4) // coefficients at precision 4
    put(0, 2); put(0, 4); put(1, 4) // 4-bit rice, 1 partition, p=1
    for (r <- Seq(5, -3, 0, 9)) {
      val u = if (r >= 0) 2L * r else -2L * r - 1
      for (_ <- 0 until (u >> 1).toInt) bit(0)
      bit(1)
      put(u & 1, 1)
    }
    pad()
    val c16 = FlacCodec.crc16(buf.toArray, frameStart, buf.length)
    buf += ((c16 >> 8) & 0xff).toByte
    buf += (c16 & 0xff).toByte
    buf.toArray
  }

  test("hand-authored LPC bitstream decodes to the spec formula " +
    "s(n) = res(n) + ((c0·s(n−1) + c1·s(n−2)) >> shift), and the " +
    "pinned encoder emits the identical bytes") {
    // independently derived: pred2 = (3·(−50) − 2·100) >> 1 = −175 →
    // s2 = −170; pred3 = (3·(−170) − 2·(−50)) >> 1 = −205 → s3 = −208;
    // pred4 = (3·(−208) − 2·(−170)) >> 1 = −142 → s4 = −142;
    // pred5 = (3·(−142) − 2·(−208)) >> 1 = −5 → s5 = 4
    val expected = Array(100, -50, -170, -208, -142, 4)
    val hand = buildLpcStream(expected, precRaw = 3, shiftField = 1)
    assert(FlacCodec.decode(hand).sameElements(expected))
    val enc = FlacCodec.encodePinnedLpc(expected, Array(3, -2),
      shift = 1, precision = 4)
    assert(enc.sameElements(hand),
      "encoder bit layout diverges from the hand-authored stream")
  }

  test("reserved LPC precision code 0b1111 and negative shifts are " +
    "rejected by name") {
    val expected = Array(100, -50, -170, -208, -142, 4)
    val badPrec = buildLpcStream(expected, precRaw = 0xf, shiftField = 1)
    assert(intercept[IllegalArgumentException](
      FlacCodec.decode(badPrec)).getMessage.contains("precision"))
    val badShift = buildLpcStream(expected, precRaw = 3,
      shiftField = 0x1f) // two's-complement −1
    assert(intercept[IllegalArgumentException](
      FlacCodec.decode(badShift)).getMessage.contains("shift"))
  }

  test("MD5 integrity: a forged STREAMINFO hash is rejected even " +
    "when every frame CRC passes") {
    val enc = FlacCodec.encode(Array.tabulate(300)(i => i - 150))
    // MD5 lives in STREAMINFO bytes 26..42 (4 marker + 4 header + 18)
    val bad = enc.clone(); bad(27) = (bad(27) ^ 0xff).toByte
    val msg = intercept[IllegalArgumentException](
      FlacCodec.decode(bad)).getMessage
    assert(msg.contains("MD5"), msg)
  }
}
