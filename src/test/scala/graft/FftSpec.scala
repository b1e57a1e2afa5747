package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Fft, Multimodal, WavCodec}

/** From-scratch radix-2 FFT (VERDICT r13 #2): hand-DFT'd 8-sample
  * fixture, closed-form single tones, Parseval against the exact
  * integer energy, and the spectral-feature path end to end. */
class FftSpec extends AnyFunSuite {

  private def naiveDft(x: Array[Double]): (Array[Double], Array[Double]) = {
    val n = x.length
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    for (k <- 0 until n; t <- 0 until n) {
      val ang = -2.0 * math.Pi * k * t / n
      re(k) += x(t) * math.cos(ang)
      im(k) += x(t) * math.sin(ang)
    }
    (re, im)
  }

  test("8-point FFT equals the hand-evaluated DFT") {
    // asymmetric fixture: every bin nonzero, no accidental symmetry
    val x = Array(1.0, 2.0, -1.0, 3.0, 0.0, -2.0, 4.0, 1.0)
    val re = x.clone()
    val im = new Array[Double](8)
    Fft.fft(re, im)
    val (er, ei) = naiveDft(x)
    // spot-check two bins against fully hand-computed values:
    // X[0] = Σx = 8; X[4] = Σx·(−1)^t = 1−2−1−3+0+2+4−1 = 0
    assert(math.abs(re(0) - 8.0) < 1e-12 && math.abs(im(0)) < 1e-12)
    assert(math.abs(re(4) - 0.0) < 1e-12 && math.abs(im(4)) < 1e-12)
    for (k <- 0 until 8) {
      assert(math.abs(re(k) - er(k)) < 1e-9, s"re bin $k")
      assert(math.abs(im(k) - ei(k)) < 1e-9, s"im bin $k")
    }
  }

  test("closed-form single tones at N=256: cos(πi/2) → bin 64 only, " +
    "cos(πi) → Nyquist only, with the exact magnitudes") {
    val n = 256
    val quarter = Array.tabulate(n)(i => i % 4 match {
      case 0 => 7; case 2 => -7; case _ => 0
    })
    val p1 = Fft.powerSpectrum(quarter)
    assert(math.abs(p1(64) - math.pow(7.0 * 128, 2)) < 1e-4)
    for (k <- p1.indices if k != 64)
      assert(p1(k) < 1e-12 * p1(64), s"leakage at bin $k: ${p1(k)}")
    val nyq = Array.tabulate(n)(i => if (i % 2 == 0) 5 else -5)
    val p2 = Fft.powerSpectrum(nyq)
    assert(math.abs(p2(128) - math.pow(5.0 * 256, 2)) < 1e-4)
    for (k <- p2.indices if k != 128)
      assert(p2(k) < 1e-12 * p2(128), s"leakage at bin $k: ${p2(k)}")
  }

  test("Parseval: Σ|X[k]|² over ALL bins == N·Σs² (exact integer " +
    "energy from the e181 path)") {
    val n = 256
    val s = Array.tabulate(n)(i => Multimodal.synthOscSample(42L, i))
    val re = s.map(_.toDouble)
    val im = new Array[Double](n)
    Fft.fft(re, im)
    val specEnergy = (0 until n)
      .map(k => re(k) * re(k) + im(k) * im(k)).sum
    val exact = s.map(v => v.toLong * v.toLong).sum
    assert(math.abs(specEnergy / n - exact.toDouble) <
      1e-9 * exact.toDouble)
  }

  test("mel filterbank: triangles partition (0, fMax) — weights at " +
    "any interior frequency sum to 1 across filters; DC and Nyquist " +
    "sit on the outer edges with zero weight everywhere") {
    for (freq <- Seq(100.0, 433.0, 2000.0, 3500.0)) {
      val ws = (1 to 20).map(f => Fft.melWeight(20, 4000.0, f, freq))
      assert(math.abs(ws.sum - 1.0) < 1e-12, s"freq $freq: ${ws.sum}")
      assert(ws.forall(w => w >= 0.0 && w <= 1.0))
    }
    assert((1 to 20).forall(f => Fft.melWeight(20, 4000.0, f, 0.0) == 0.0))
    assert((1 to 20).forall(f =>
      Fft.melWeight(20, 4000.0, f, 4000.0) == 0.0))
    // the 2000 Hz gate tone straddles exactly filters 14 and 15
    val at2k = (1 to 20).filter(f =>
      Fft.melWeight(20, 4000.0, f, 2000.0) > 0.0)
    assert(at2k == Seq(14, 15))
  }

  test("mfcc: c0 equals the plain sum of log-mel energies (cos(0) " +
    "column), and a single-tone frame yields exactly two nonzero " +
    "filters") {
    val n = 256
    val tone = Array.tabulate(n)(i => i % 4 match {
      case 0 => 300; case 2 => -300; case _ => 0
    })
    val p = Fft.powerSpectrum(tone)
    val logMel = (1 to 20).map { f =>
      val e = p.indices.map(k =>
        Fft.melWeight(20, 4000.0, f, k * 31.25) * p(k)).sum
      math.log(1.0 + e)
    }
    assert(logMel.count(_ > 1e-9) == 2)
    val cs = Fft.mfcc(p, 31.25, 4000.0, 20, 6)
    assert(math.abs(cs(0) - logMel.sum) < 1e-9)
  }

  test("non-power-of-two frames are rejected, not silently padded") {
    intercept[IllegalArgumentException] {
      Fft.fft(new Array[Double](6), new Array[Double](6))
    }
    intercept[IllegalArgumentException] {
      Fft.fft(new Array[Double](4), new Array[Double](5))
    }
  }

  test("spectral feature path: two-tone WAV roundtrip produces the " +
    "closed-form dominant/centroid/rolloff per frame") {
    // doc 7: a1 = 2·7+201 = 215, a2 = 107; P1 = (215·128)²,
    // P2 = (107·256)²; doc 7 has k = 1 + 7%3 = 2 frames
    val id = 7L
    val samples = Array.tabulate(Multimodal.synthToneLen(id))(i =>
      Multimodal.synthToneSample(id, i))
    val wav = WavCodec.encodePcm16(samples)
    val decoded = WavCodec.decodePcm16(wav)
    assert(decoded.sameElements(samples))
    val frames = decoded.grouped(256).toSeq
    assert(frames.length == 2)
    val p1 = math.pow(215.0 * 128, 2)
    val p2 = math.pow(107.0 * 256, 2)
    frames.foreach { fr =>
      val p = Fft.powerSpectrum(fr)
      val dom = p.indices.maxBy(p)
      assert(dom == (if (p1 >= p2) 64 else 128))
      val centroid = p.indices.map(k => k * p(k)).sum / p.sum
      val want = (64 * p1 + 128 * p2) / (p1 + p2)
      assert(math.abs(centroid - want) < 1e-6)
    }
  }
}
