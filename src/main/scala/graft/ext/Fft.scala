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

  /** Mel scale (O'Shaughnessy 1987, the HTK constant set):
    * m(f) = 2595·log₁₀(1 + f/700). Filter edge j of `nFilters`
    * triangles spanning [0, fMax] in mel space, j ∈ 0..nFilters+1.
    * The expression trees here are MIRRORED verbatim by the e199
    * DuckDB oracle — keep the operation order if editing. */
  def melEdgeHz(nFilters: Int, fMax: Double, j: Int): Double = {
    val melMax = 2595.0 * math.log10(1.0 + fMax / 700.0)
    700.0 * (math.pow(10.0, (melMax * j / (nFilters + 1.0)) / 2595.0)
      - 1.0)
  }

  /** Triangular weight of mel filter `f` (1-based) at `freq` Hz:
    * rises over (left, mid], falls over (mid, right), zero outside —
    * bin frequencies exactly on the outer edges (DC, Nyquist) get
    * zero weight, the standard filterbank convention. */
  def melWeight(nFilters: Int, fMax: Double, f: Int,
                freq: Double): Double = {
    val left = melEdgeHz(nFilters, fMax, f - 1)
    val mid = melEdgeHz(nFilters, fMax, f)
    val right = melEdgeHz(nFilters, fMax, f + 1)
    if (freq > left && freq <= mid) (freq - left) / (mid - left)
    else if (freq > mid && freq < right) (right - freq) / (right - mid)
    else 0.0
  }

  /** MFCC of a one-sided power spectrum: mel filterbank energies,
    * ln(1 + E) compression (the +1 floor keeps empty filters exactly
    * 0 instead of −∞ — and absorbs FFT leakage ~1e-19 on the gate
    * signals), then DCT-II over the filter axis:
    * c_n = Σ_f L_f · cos(π·n·(f−0.5)/F). */
  def mfcc(power: Array[Double], binHz: Double, fMax: Double,
           nFilters: Int, nCoefs: Int): Array[Double] = {
    val logMel = Array.tabulate(nFilters) { i =>
      val f = i + 1
      var e = 0.0
      var k = 0
      while (k < power.length) {
        e += melWeight(nFilters, fMax, f, k * binHz) * power(k)
        k += 1
      }
      math.log(1.0 + e)
    }
    Array.tabulate(nCoefs) { n =>
      var c = 0.0
      var f = 1
      while (f <= nFilters) {
        c += logMel(f - 1) *
          math.cos(math.Pi * n * (f - 0.5) / nFilters)
        f += 1
      }
      c
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
