package graft.ext

/** From-scratch iterative radix-2 FFT (Cooley–Tukey 1965, the public
  * textbook decimation-in-time form: bit-reversal permutation followed
  * by log₂N butterfly stages) — the same zero-dependency from-spec
  * discipline as [[JpegCodec]]/[[WavCodec]], for the spectral stage of
  * the audio curation path (VERDICT r13 #2).
  *
  * Design notes:
  *  - In-place on parallel re/im arrays — the per-frame hot loop
  *    allocates nothing beyond the two arrays, so a `mapPartitions`
  *    decode-and-featurize pass streams frames without GC pressure.
  *  - Power-of-two lengths only, enforced: silently zero-padding would
  *    change the bin semantics the oracles depend on. Callers frame
  *    audio into power-of-two windows instead.
  *  - Twiddle factors from `Math.cos`/`Math.sin` per stage; on the
  *    integer-exact gate signals the accumulated relative error is
  *    ~1e-15 per bin, far inside the round-6 oracle margins
  *    (`e194_audio_spectrum`'s scaladoc carries the error budget).
  *
  * Verified against a hand-evaluated 8-point DFT and closed-form
  * single-tone spectra in `FftSpec`, and by Parseval's theorem against
  * the exact integer Σs² energy the e181 path computes.
  */
object Fft {

  /** In-place complex FFT. `re.length` must equal `im.length` and be a
    * power of two. */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length, s"re/im length mismatch: $n vs ${im.length}")
    require(n > 0 && (n & (n - 1)) == 0,
      s"FFT length must be a power of two, got $n")
    // bit-reversal permutation
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    // butterfly stages
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val i0 = base + k
          val i1 = i0 + len / 2
          val xr = re(i1) * cr - im(i1) * ci
          val xi = re(i1) * ci + im(i1) * cr
          re(i1) = re(i0) - xr
          im(i1) = im(i0) - xi
          re(i0) += xr
          im(i0) += xi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** One-sided power spectrum of a real integer frame: bins 0..N/2,
    * `P[k] = |X[k]|²`. The frame length must be a power of two. */
  def powerSpectrum(samples: Array[Int]): Array[Double] = {
    val n = samples.length
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    var i = 0
    while (i < n) { re(i) = samples(i).toDouble; i += 1 }
    fft(re, im)
    val out = new Array[Double](n / 2 + 1)
    var k = 0
    while (k <= n / 2) {
      out(k) = re(k) * re(k) + im(k) * im(k)
      k += 1
    }
    out
  }
}
