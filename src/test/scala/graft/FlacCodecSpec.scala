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
