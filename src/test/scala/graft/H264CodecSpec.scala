package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.H264Codec
import graft.ext.H264Codec.{DcPredMb, Mb, PcmMb}

/** From-scratch H.264 I-frame codec (VERDICT r13 #7): Annex B framing
  * with emulation prevention, Exp-Golomb headers, I_PCM exactness,
  * and spec-rounded cross-MB DC intra prediction. */
class H264CodecSpec extends AnyFunSuite {

  private def flat(v: Int): PcmMb = PcmMb(Array.fill(256)(v))

  test("I_PCM roundtrip is bit-exact, including 0x00..0x03 sample " +
    "runs that force emulation-prevention bytes") {
    // rows of 0,1,2,3 repeated: raw RBSP would carry 00 00 01/02/03
    val mb = PcmMb(Array.tabulate(256)(i => i % 4), cb = 7, cr = 200)
    val bytes = H264Codec.encode(1, 1, Seq(mb))
    // the payload contains long 00 runs; no start-code pattern may
    // appear after the three real start codes
    val starts = (0 until bytes.length - 3).count(i =>
      bytes(i) == 0 && bytes(i + 1) == 0 && bytes(i + 2) == 0 &&
        bytes(i + 3) == 1)
    assert(starts == 3, s"emulation prevention failed: $starts starts")
    val f = H264Codec.decode(bytes)
    assert(f.width == 16 && f.height == 16)
    assert(f.y.toSeq == (0 until 256).map(_ % 4))
    assert(f.cb.forall(_ == 7) && f.cr.forall(_ == 200))
  }

  test("DC prediction: no neighbors → 128; left-only and top-only " +
    "pass the neighbor value through ((16·V + 8) >> 4 = V)") {
    val alone = H264Codec.decode(H264Codec.encode(1, 1, Seq(DcPredMb)))
    assert(alone.y.forall(_ == 128))
    val leftOnly = H264Codec.decode(
      H264Codec.encode(2, 1, Seq(flat(77), DcPredMb)))
    assert((0 until 16).forall(y =>
      (16 until 32).forall(x => leftOnly.y(y * 32 + x) == 77)))
    val topOnly = H264Codec.decode(
      H264Codec.encode(1, 2, Seq(flat(91), DcPredMb)))
    assert((16 until 32).forall(y =>
      (0 until 16).forall(x => topOnly.y(y * 16 + x) == 91)))
  }

  test("3x3 checkerboard: both-neighbor MBs reconstruct to the " +
    "spec-rounded mean (VL + VT + 1) >> 1") {
    def v(mx: Int, my: Int) = 40 + mx * 31 + my * 17
    val mbs: Seq[Mb] = for (my <- 0 until 3; mx <- 0 until 3) yield
      if ((mx + my) % 2 == 0) flat(v(mx, my)) else DcPredMb
    val f = H264Codec.decode(H264Codec.encode(3, 3, mbs))
    def mbVal(mx: Int, my: Int) = f.y((my * 16 + 8) * 48 + mx * 16 + 8)
    assert(mbVal(0, 0) == v(0, 0) && mbVal(2, 2) == v(2, 2))
    assert(mbVal(1, 0) == v(0, 0)) // left only
    assert(mbVal(0, 1) == v(0, 0)) // top only
    assert(mbVal(2, 1) == (v(1, 1) + v(2, 0) + 1) >> 1)
    assert(mbVal(1, 2) == (v(0, 2) + v(1, 1) + 1) >> 1)
    // every MB is uniform (prediction fills all 256 samples)
    for (my <- 0 until 3; mx <- 0 until 3; py <- 0 until 16;
         px <- 0 until 16)
      assert(f.y((my * 16 + py) * 48 + mx * 16 + px) == mbVal(mx, my))
  }

  test("malformed streams fail fast by name") {
    val good = H264Codec.encode(1, 1, Seq(flat(50)))
    assert(intercept[IllegalArgumentException](
      H264Codec.decode(good.dropRight(40))).getMessage
      .toLowerCase.contains("truncated"))
    // flip profile_idc (first RBSP byte of the SPS, offset 5)
    val badProfile = good.clone(); badProfile(5) = 100.toByte
    assert(intercept[IllegalArgumentException](
      H264Codec.decode(badProfile)).getMessage.contains("profile"))
    assert(intercept[IllegalArgumentException](
      H264Codec.decode(Array.fill[Byte](32)(0x55))).getMessage
      .contains("NAL"))
  }
}
