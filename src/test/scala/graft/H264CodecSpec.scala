package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.H264Codec
import graft.ext.H264Codec.{BBiMb, BL0Mb, BL1Mb, BMb, DcPredMb,
  DcResidualMb, I4x4Mb, Mb, PMb, PMvMb, PSkip, PcmMb}

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

  /** The spec dequant chain for a uniform DC level at QP 26,
    * re-derived independently of the codec: f = L (Hadamard of a
    * DC-only block is uniform), dcY = (13·f + 2) >> 2,
    * residual = (dcY + 32) >> 6. */
  private def uniformResidual(level: Int): Int =
    (((13 * level + 2) >> 2) + 32) >> 6

  test("DC residual levels reconstruct to pred + the QP-26 dequant " +
    "chain, across sign bits, prefix-14 and prefix-15 escapes") {
    for (l <- Seq(0, 1, -1, 2, 9, 16, 17, 64, 300, 699, -300, -699)) {
      val f = H264Codec.decode(H264Codec.encode(1, 1,
        Seq(DcResidualMb(l))))
      val expect = math.max(0, math.min(255, 128 + uniformResidual(l)))
      assert(f.y.forall(_ == expect), s"level $l → ${f.y(0)}, " +
        s"want $expect")
    }
    // FLC class (nC ≥ 8): residual MB with an I_PCM left neighbor
    val two = H264Codec.decode(H264Codec.encode(2, 1,
      Seq(flat(100), DcResidualMb(300))))
    val expect = 100 + uniformResidual(300)
    assert((0 until 16).forall(y =>
      (16 until 32).forall(x => two.y(y * 32 + x) == expect)))
  }

  test("a coefficient at zigzag position 1 splits the MB by block " +
    "column: +L on the left half, −L on the right (f = L·H(j,1))") {
    val f = H264Codec.decode(H264Codec.encode(1, 1,
      Seq(DcResidualMb(300, zigzagPos = 1))))
    val plus = 128 + uniformResidual(300)
    val minus = 128 + ((((-300 * 13) + 2) >> 2) + 32 >> 6)
    for (y <- 0 until 16; x <- 0 until 16) {
      val want = if (x < 8) plus else minus
      assert(f.y(y * 16 + x) == want, s"($x,$y)")
    }
  }

  test("CAVLC DC block bits match hand-derived Table 9-5 / 9-7 / " +
    "level-coding strings") {
    def bits(l: Int, pos: Int, nC: Int): Seq[Int] =
      H264Codec.cavlcDcBlockBits(l, pos, nC).map(_ & 0xff).toSeq
    // all-zero block, class 0: coeff_token(0,0) = '1'
    assert(bits(0, 0, 0) == Seq(0x80))
    // ±1: token (1,1) '01' + sign + total_zeros(0) '1'
    assert(bits(1, 0, 0) == Seq(0x50)) // 0101
    assert(bits(-1, 0, 0) == Seq(0x70)) // 0111
    // level 2: token (1,0) '000101', levelCode 0 → '1', tz '1'
    assert(bits(2, 0, 0) == Seq(0x17)) // 00010111
    // level 9: levelCode 14 → prefix-14 escape + 4-bit suffix 0
    assert(bits(9, 0, 0) == Seq(0x14, 0x00, 0x08, 0x40))
    // level 17: levelCode 30 → prefix-15 escape + 12-bit suffix 0
    assert(bits(17, 0, 0) == Seq(0x14, 0x00, 0x04, 0x00, 0x20))
    // zigzag position rides total_zeros: pos 3 → '0011'
    assert(bits(5, 3, 0) == Seq(0x14, 0x09, 0x80)) // 000101 0000001 0011
    // FLC class: (0,0) → 000011; (1,0) → 000000 + '1' + '1'
    assert(bits(0, 0, 16) == Seq(0x0c))
    assert(bits(2, 0, 8) == Seq(0x03))
    assert(bits(1, 0, 8) == Seq(0x05)) // 000001 + sign 0 + tz 1
  }

  test("I_4x4: DC with no neighbors is 128; H copies the left " +
    "column through every block; V copies the top row; mixed modes " +
    "exercise all four most-probable-mode coding paths") {
    val alone = H264Codec.decode(H264Codec.encode(1, 1,
      Seq(I4x4Mb.uniform(2))))
    assert(alone.y.forall(_ == 128))
    // H against a row-gradient PCM: every row carries its left pixel
    val rowGrad = PcmMb(Array.tabulate(256)(i => 10 + 3 * (i / 16)))
    val h = H264Codec.decode(H264Codec.encode(2, 1,
      Seq(rowGrad, I4x4Mb.uniform(1))))
    for (y <- 0 until 16; x <- 16 until 32)
      assert(h.y(y * 32 + x) == 10 + 3 * y, s"($x,$y)")
    // V against a column-gradient PCM above
    val colGrad = PcmMb(Array.tabulate(256)(i => 5 * (i % 16)))
    val v = H264Codec.decode(H264Codec.encode(1, 2,
      Seq(colGrad, I4x4Mb.uniform(0))))
    for (y <- 16 until 32; x <- 0 until 16)
      assert(v.y(y * 16 + x) == 5 * x, s"($x,$y)")
    // mixed modes: block 0 DC (pred hit), block 1 H (remainder),
    // later blocks H with pred 1 (flag hit) — all reconstruct to the
    // left PCM constant
    val modes = Array.fill(16)(1); modes(0) = 2
    val mixed = H264Codec.decode(H264Codec.encode(2, 1,
      Seq(flat(83), I4x4Mb(modes))))
    for (y <- 0 until 16; x <- 16 until 32)
      assert(mixed.y(y * 32 + x) == 83, s"($x,$y)")
  }

  test("I_4x4 Vertical with no top neighbor is rejected by name") {
    val msg = intercept[IllegalArgumentException](
      H264Codec.decode(H264Codec.encode(1, 1,
        Seq(I4x4Mb.uniform(0))))).getMessage
    assert(msg.contains("Vertical"), msg)
  }

  private def pcmPattern(seed: Int): Seq[Mb] =
    for (my <- 0 until 3; mx <- 0 until 3) yield
      (PcmMb(Array.tabulate(256)(i =>
        (seed + (my * 16 + i / 16) * 48 + mx * 16 + i % 16) % 256)):
        Mb)

  test("an all-P_SKIP frame reproduces the reference exactly " +
    "(derived zero motion at every edge/zero-neighbor)") {
    val fs = H264Codec.decodeSequence(H264Codec.encodeIP(3, 3,
      pcmPattern(11), Seq.fill[PMb](9)(PSkip)))
    assert(fs.length == 2)
    assert(fs(1).y.sameElements(fs(0).y))
    assert(fs(1).cb.sameElements(fs(0).cb))
  }

  test("P_L0_16x16 even-full-pel vectors copy shifted, edge-clamped " +
    "reference pixels; skip rows around them stay exact copies") {
    // row 1 coded with mv (8·(mx−1), −40) quarter-pel = pixel shift
    // (2·(mx−1), −10); rows 0 and 2 skip (their derived mv is 0 —
    // row 2's left neighbor chain starts at an unavailable A)
    val pmbs: Seq[PMb] = for (my <- 0 until 3; mx <- 0 until 3) yield
      if (my == 1) (PMvMb(8 * (mx - 1), -40): PMb) else PSkip
    val fs = H264Codec.decodeSequence(H264Codec.encodeIP(3, 3,
      pcmPattern(7), pmbs))
    val f0 = fs(0); val f1 = fs(1)
    for (yy <- 0 until 48; xx <- 0 until 48) {
      val want =
        if (yy < 16 || yy >= 32) f0.y(yy * 48 + xx)
        else {
          val dx = 2 * (xx / 16) - 2
          val sx = math.max(0, math.min(47, xx + dx))
          f0.y((yy - 10) * 48 + sx)
        }
      assert(f1.y(yy * 48 + xx) == want, s"($xx,$yy)")
    }
  }

  test("the mvA pass-through rule: in a single row, a second coded " +
    "MB predicts from its left neighbor (B and C unavailable)") {
    val mbs: Seq[Mb] = Seq(flat(60), flat(70), flat(80))
    val pmbs: Seq[PMb] = Seq(PMvMb(16, 0), PMvMb(16, 0), PSkip)
    // both coded MBs shift 4 px left-to-right source; the second's
    // mvd is (0,0) thanks to mvp = mvA — roundtrip must still land
    // the same copy
    val fs = H264Codec.decodeSequence(H264Codec.encodeIP(3, 1, mbs,
      pmbs))
    val f0 = fs(0); val f1 = fs(1)
    for (yy <- 0 until 16; xx <- 0 until 32) {
      val sx = math.min(47, xx + 4)
      assert(f1.y(yy * 48 + xx) == f0.y(yy * 48 + sx), s"($xx,$yy)")
    }
    // the skip MB: B unavailable → zero motion → in-place copy
    for (yy <- 0 until 16; xx <- 32 until 48)
      assert(f1.y(yy * 48 + xx) == f0.y(yy * 48 + xx))
  }

  test("decode() refuses multi-picture streams by name") {
    val two = H264Codec.encodeIP(1, 1, Seq(flat(9)), Seq(PSkip))
    val msg2 = intercept[IllegalArgumentException](
      H264Codec.decode(two)).getMessage
    assert(msg2.contains("decodeSequence"), msg2)
  }

  test("sub-pel motion: half-pel matches the hand-computed 6-tap " +
    "filter, quarter-pel the rounded average, the center j the " +
    "two-stage unrounded filter, chroma the bilinear seam blend") {
    def p(x: Int, yy: Int): Int = (7 * x + 11 * yy) % 256
    val iMbs: Seq[Mb] = for (my <- 0 until 3; mx <- 0 until 3) yield
      PcmMb(Array.tabulate(256)(i =>
        p(mx * 16 + i % 16, my * 16 + i / 16)),
        cb = 100 + 50 * mx, cr = 60)
    def pc(x: Int): Int = math.max(0, math.min(47, x))
    def bAt(x: Int, yy: Int): Int = { // spec 6-tap, re-derived here
      val s = p(pc(x - 2), yy) - 5 * p(pc(x - 1), yy) +
        20 * p(pc(x), yy) + 20 * p(pc(x + 1), yy) -
        5 * p(pc(x + 2), yy) + p(pc(x + 3), yy)
      math.max(0, math.min(255, (s + 16) >> 5))
    }
    def decodeWithMv(vx: Int, vy: Int): H264Codec.Frame = {
      val pmbs: Seq[PMb] = Seq.tabulate(9)(i =>
        if (i == 4) PMvMb(vx, vy) else PSkip) // center MB (1,1)
      H264Codec.decodeSequence(
        H264Codec.encodeIP(3, 3, iMbs, pmbs))(1)
    }
    // half-pel horizontal at the center MB: sample (20, 20)
    val fH = decodeWithMv(2, 0)
    assert(fH.y(20 * 48 + 20) == bAt(20, 20))
    assert(fH.y(20 * 48 + 31) == bAt(31, 20)) // MB-edge taps
    // quarter-pel (1,0) = avg(G, b) rounded up
    val fQ = decodeWithMv(1, 0)
    assert(fQ.y(20 * 48 + 20) == (p(20, 20) + bAt(20, 20) + 1) >> 1)
    // center j at (2,2): vertical 6-tap over UNROUNDED horizontal
    // intermediates, +512 >> 10
    def bRaw(x: Int, yy: Int): Int =
      p(pc(x - 2), yy) - 5 * p(pc(x - 1), yy) + 20 * p(pc(x), yy) +
        20 * p(pc(x + 1), yy) - 5 * p(pc(x + 2), yy) + p(pc(x + 3), yy)
    val fJ = decodeWithMv(2, 2)
    val j1 = bRaw(20, 18) - 5 * bRaw(20, 19) + 20 * bRaw(20, 20) +
      20 * bRaw(20, 21) - 5 * bRaw(20, 22) + bRaw(20, 23)
    assert(fJ.y(20 * 48 + 20) ==
      math.max(0, math.min(255, (j1 + 512) >> 10)))
    // chroma half-pel (xf=4) at the cb seam between MB columns 1 and
    // 2 (values 150 and 200): blend = (4·8·150 + 4·8·200 + 32) >> 6
    val fC = decodeWithMv(4, 0)
    assert(fC.cb(10 * 24 + 15) == ((32 * 150 + 32 * 200 + 32) >> 6))
    // constant-region chroma is unchanged by fractional motion
    assert(fC.cr(10 * 24 + 12) == 60)
  }

  test("B slice: L0 and L1 single-list copies and the bi-predicted " +
    "average (predL0 + predL1 + 1) >> 1, including a sub-pel side") {
    def p(x: Int, yy: Int): Int = (3 * x + 13 * yy) % 256
    val iMbs: Seq[Mb] = for (my <- 0 until 3; mx <- 0 until 3) yield
      PcmMb(Array.tabulate(256)(i =>
        p(mx * 16 + i % 16, my * 16 + i / 16)))
    val bMbs: Seq[BMb] = for (my <- 0 until 3; mx <- 0 until 3) yield
      my match {
        case 0 => BL0Mb(8, 0) // +2 px right
        case 1 => BBiMb(8, 0, -8, 0) // avg of ±2 px
        case 2 => BL1Mb(0, -16) // 4 px up
      }
    val fs = H264Codec.decodeSequence(
      H264Codec.encodeIB(3, 3, iMbs, bMbs))
    assert(fs.length == 2)
    val f0 = fs(0); val f1 = fs(1)
    def cl(v: Int): Int = math.max(0, math.min(47, v))
    for (yy <- 0 until 48; xx <- 0 until 48) {
      val want =
        if (yy < 16) f0.y(yy * 48 + cl(xx + 2))
        else if (yy < 32)
          (f0.y(yy * 48 + cl(xx + 2)) + f0.y(yy * 48 + cl(xx - 2)) +
            1) >> 1
        else f0.y(cl(yy - 4) * 48 + xx)
      assert(f1.y(yy * 48 + xx) == want, s"($xx,$yy)")
    }
    // a bi MB with one half-pel side: average of the 6-tap result
    // and the plain pixel
    val biSub: Seq[BMb] = Seq.tabulate(9)(i =>
      if (i == 4) BBiMb(2, 0, 0, 0) else BL0Mb(0, 0))
    val g = H264Codec.decodeSequence(
      H264Codec.encodeIB(3, 3, iMbs, biSub))(1)
    def b6(x: Int, yy: Int): Int = {
      val s = p(cl(x - 2), yy) - 5 * p(cl(x - 1), yy) +
        20 * p(cl(x), yy) + 20 * p(cl(x + 1), yy) -
        5 * p(cl(x + 2), yy) + p(cl(x + 3), yy)
      math.max(0, math.min(255, (s + 16) >> 5))
    }
    assert(g.y(20 * 48 + 20) == (b6(20, 20) + p(20, 20) + 1) >> 1)
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
