package graft.ext

/** From-scratch FLAC codec (the public xiph.org format spec / RFC
  * 9639) — the COMPRESSED-audio member of the codec family, closing
  * the seam `ext/Multimodal.scala` documented after r13's JPEG: web
  * audio corpora ship lossless FLAC alongside lossy MP3/AAC, and FLAC
  * is the one whose entire decode path is EXACT integer arithmetic —
  * rice-coded residuals + fixed polynomial predictors — so the codec
  * gate keeps the repo's hash-exact oracle contract with no float
  * anywhere (the audio analog of the JPEG block-constant trick, except
  * nothing is constrained: ARBITRARY 16-bit content roundtrips).
  *
  * Implemented (spec section names): the `fLaC` marker; STREAMINFO
  * with the real MD5 of the unencoded samples (verified on decode —
  * end-to-end integrity, not a stub); unknown metadata blocks skipped
  * by length; fixed-blocksize frames with the 14-bit sync code,
  * blocksize/rate/channel/sample-size codes, the UTF-8-style coded
  * frame number, and the real CRC-8 (poly 0x07) header check; mono
  * subframes CONSTANT, VERBATIM, and FIXED orders 0–4 (warmup +
  * rice-partitioned residual, 4-bit parameters, escape-to-raw
  * partitions, zigzag fold); the order-k polynomial reconstruction
  * (1,-1 / 2,-1 / 3,-3,1 / 4,-6,4,-1); and the frame-trailing CRC-16
  * (poly 0x8005); STEREO with all four channel assignments —
  * independent L/R, left/side, right/side, and mid/side (mid =
  * (L+R)>>1, side = L−R; the decoder restores L+R exactly as
  * (mid<<1)|(side&1), so decorrelation is lossless integer math,
  * with the SIDE subframe read at 17 bits per the spec); and LPC
  * subframes (types 32–63, orders 1–32): warmup + 4-bit coefficient
  * precision + 5-bit signed shift + quantized coefficients + the
  * same rice residual, reconstructed as
  * `s(n) = res(n) + ((Σ c_j·s(n-1-j)) >> shift)` in 64-bit
  * accumulation. The ENCODER's Levinson-Durbin stage uses doubles
  * only to CHOOSE coefficients; the coded residual is computed with
  * the quantized integers, so the roundtrip is bit-exact for ANY
  * coefficient choice — the lossless-by-construction property that
  * keeps this codec inside the repo's hash-exact oracle contract.
  * Rejected fail-fast by name: variable blocksize, >2 channels,
  * non-16-bit depths, negative LPC shifts, the reserved precision
  * code 0b1111.
  *
  * Scale shape: like every codec here, encode/decode are
  * partition-local byte-blob functions behind the [[Multimodal]]
  * seam — no shuffle until the per-frame feature rows.
  */
object FlacCodec {

  private val BlockSize = 256

  // ------------------------------------------------------------- CRC
  /** CRC-8, polynomial x⁸+x²+x+1 (0x07), MSB-first, init 0. */
  def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= bytes(i) & 0xff
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff
        else (crc << 1) & 0xff
        b += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, polynomial x¹⁶+x¹⁵+x²+1 (0x8005), MSB-first, init 0. */
  def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (bytes(i) & 0xff) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
        else (crc << 1) & 0xffff
        b += 1
      }
      i += 1
    }
    crc
  }

  // ------------------------------------------------------------ bits
  private final class BitWriter {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var acc = 0
    private var nBits = 0
    def bit(b: Int): Unit = {
      acc = (acc << 1) | (b & 1); nBits += 1
      if (nBits == 8) { buf += acc.toByte; acc = 0; nBits = 0 }
    }
    def u(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bit(((v >> i) & 1L).toInt); i -= 1 }
    }
    /** FLAC unary: q zero bits terminated by a 1. */
    def unary(q: Int): Unit = { var i = 0; while (i < q) { bit(0); i += 1 }; bit(1) }
    def alignZero(): Unit = while (nBits != 0) bit(0)
    def size: Int = { require(nBits == 0, "unaligned"); buf.length }
  }

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    def bit(): Int = {
      if (nBits == 0) {
        require(pos < data.length, "FLAC: truncated stream")
        acc = data(pos) & 0xff; pos += 1; nBits = 8
      }
      nBits -= 1
      (acc >> nBits) & 1
    }
    def u(n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def unary(): Int = {
      var q = 0
      while (bit() == 0) {
        q += 1
        require(q < (1 << 24), "FLAC: unbounded unary run")
      }
      q
    }
    def align(): Unit = nBits = 0
    def aligned: Boolean = nBits == 0
  }

  private def signExtend(v: Long, bits: Int): Int =
    ((v << (64 - bits)) >> (64 - bits)).toInt

  /** MD5 of the unencoded samples as the spec hashes them: channel-
    * interleaved little-endian bytes (mono 16-bit here). */
  private def sampleMd5(samples: Array[Int]): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val bb = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bb(2 * i) = (samples(i) & 0xff).toByte
      bb(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    md.digest(bb)
  }

  // ---------------------------------------------------------- encode
  /** Encode mono 16-bit samples at 8 kHz: fixed 256-sample frames
    * (short last frame), per-frame subframe choice — CONSTANT when
    * the block is constant, VERBATIM when `forceVerbatim` marks the
    * frame, else FIXED with the given predictor order. */
  def encode(samples: Array[Int], fixedOrder: Int = 1,
             forceVerbatim: Int => Boolean = _ => false,
             lpcOrder: Int = 0): Array[Byte] = {
    require(fixedOrder >= 0 && fixedOrder <= 4, "fixed order 0..4")
    require(lpcOrder >= 0 && lpcOrder <= 32, "LPC order 0..32")
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    out ++= "fLaC".getBytes("US-ASCII")
    // STREAMINFO: last-metadata flag + type 0, length 34
    val si = new BitWriter
    si.u(1, 1); si.u(0, 7); si.u(34, 24)
    si.u(BlockSize.toLong, 16); si.u(BlockSize.toLong, 16)
    si.u(0, 24); si.u(0, 24) // frame sizes unknown
    si.u(8000, 20)
    si.u(0, 3) // channels - 1
    si.u(15, 5) // bits per sample - 1
    si.u(samples.length.toLong, 36)
    si.alignZero()
    out ++= si.buf
    out ++= sampleMd5(samples)
    var frameIdx = 0
    var off = 0
    while (off < samples.length || (samples.length == 0 && frameIdx == 0)) {
      val bs = math.min(BlockSize, samples.length - off)
      if (bs > 0) {
        out ++= encodeFrame(samples, off, bs, frameIdx, fixedOrder,
          forceVerbatim(frameIdx), lpcOrder)
        off += bs
      }
      frameIdx += 1
      if (samples.length == 0) off = 1 // no frames for empty input
    }
    out.toArray
  }

  private def codedNumber(w: BitWriter, v: Int): Unit =
    if (v < 0x80) w.u(v.toLong, 8)
    else if (v < 0x800) {
      w.u(0xc0L | (v >> 6), 8); w.u(0x80L | (v & 0x3f), 8)
    } else {
      require(v < 0x10000, "FLAC: frame number too large for encoder")
      w.u(0xe0L | (v >> 12), 8); w.u(0x80L | ((v >> 6) & 0x3f), 8)
      w.u(0x80L | (v & 0x3f), 8)
    }

  private def encodeFrame(samples: Array[Int], off: Int, bs: Int,
                          frameIdx: Int, fixedOrder: Int,
                          verbatim: Boolean,
                          lpcOrder: Int = 0): Array[Byte] = {
    val w = new BitWriter
    w.u(0x3ffeL, 14) // sync
    w.u(0, 1) // reserved
    w.u(0, 1) // blocking strategy: fixed
    val bsCode = if (bs == BlockSize) 8L else 7L // 256=256<<0 / 16-bit-1
    w.u(bsCode, 4)
    w.u(0, 4) // sample rate: from STREAMINFO
    w.u(0, 4) // channel assignment: mono
    w.u(4, 3) // sample size: 16 bit
    w.u(0, 1) // reserved
    codedNumber(w, frameIdx)
    if (bsCode == 7L) w.u((bs - 1).toLong, 16)
    w.alignZero()
    w.buf += crc8(w.buf.toArray, 0, w.buf.length).toByte
    writeSubframe(w, samples, off, bs, 16, fixedOrder, verbatim,
      lpcOrder)
    w.alignZero()
    val body = w.buf
    val c16 = crc16(body.toArray, 0, body.length)
    body += ((c16 >> 8) & 0xff).toByte
    body += (c16 & 0xff).toByte
    body.toArray
  }

  /** One subframe at `bits` sample width (17 for a SIDE channel).
    * `lpcOrder > 0` switches non-constant, non-verbatim blocks to an
    * LPC subframe with Levinson-Durbin-quantized coefficients;
    * `pinnedLpc` (spec hook) forces an explicit (coefs, shift,
    * precision) triple so tests can pin the exact bit layout. */
  private def writeSubframe(w: BitWriter, samples: Array[Int], off: Int,
                            bs: Int, bits: Int, fixedOrder: Int,
                            verbatim: Boolean, lpcOrder: Int = 0,
                            pinnedLpc: Option[(Array[Int], Int, Int)] =
                              None): Unit = {
    val mask = (1L << bits) - 1
    val const = (1 until bs).forall(i => samples(off + i) == samples(off))
    if (const) {
      w.u(0, 1); w.u(0, 6); w.u(0, 1) // CONSTANT
      w.u(samples(off).toLong & mask, bits)
    } else if (verbatim) {
      w.u(0, 1); w.u(1, 6); w.u(0, 1)
      for (i <- 0 until bs) w.u(samples(off + i).toLong & mask, bits)
    } else if (pinnedLpc.isDefined) {
      val (qc, shift, prec) = pinnedLpc.get
      writeLpcSubframe(w, samples, off, bs, bits, qc, shift, prec)
    } else if (lpcOrder > 0 && bs > 1) {
      val k = math.min(lpcOrder, bs - 1)
      val (qc, shift) = quantizedLpc(samples, off, bs, k, LpcPrecision)
      writeLpcSubframe(w, samples, off, bs, bits, qc, shift,
        LpcPrecision)
    } else {
      val k = math.min(fixedOrder, bs - 1)
      w.u(0, 1); w.u(8L + k, 6); w.u(0, 1) // FIXED order k
      for (i <- 0 until k) w.u(samples(off + i).toLong & mask, bits)
      writeRiceResidual(w, residual(samples, off, bs, k))
    }
  }

  /** Encoder-side LPC coefficient precision (qlp precision − 1 = 11
    * goes in the 4-bit field; the spec ceiling is 15, 0b1111 is
    * reserved). */
  private val LpcPrecision = 12

  /** LPC subframe: type 0b1xxxxx carrying order−1, warmup samples,
    * 4-bit precision−1, 5-bit signed shift, `order` signed quantized
    * coefficients, then the shared rice residual. The residual is
    * computed with the QUANTIZED integers — exactly what the decoder
    * inverts — so losslessness never depends on coefficient quality. */
  private def writeLpcSubframe(w: BitWriter, samples: Array[Int],
                               off: Int, bs: Int, bits: Int,
                               qcoef: Array[Int], shift: Int,
                               precision: Int): Unit = {
    val order = qcoef.length
    require(order >= 1 && order <= 32 && order < bs,
      s"LPC order $order out of range for block $bs")
    require(shift >= 0 && shift <= 15, "LPC shift 0..15")
    require(precision >= 2 && precision <= 15, "LPC precision 2..15")
    val lim = 1 << (precision - 1)
    qcoef.foreach(c => require(c >= -lim && c < lim,
      s"coefficient $c exceeds $precision-bit range"))
    val mask = (1L << bits) - 1
    w.u(0, 1); w.u(32L + (order - 1), 6); w.u(0, 1)
    for (i <- 0 until order) w.u(samples(off + i).toLong & mask, bits)
    w.u((precision - 1).toLong, 4)
    w.u(shift.toLong & 0x1f, 5)
    val cMask = (1L << precision) - 1
    qcoef.foreach(c => w.u(c.toLong & cMask, precision))
    val res = Array.tabulate(bs - order) { j =>
      val i = off + order + j
      var acc = 0L
      var c = 0
      while (c < order) {
        acc += qcoef(c).toLong * samples(i - 1 - c); c += 1
      }
      val r = samples(i).toLong - (acc >> shift)
      require(r >= Int.MinValue && r <= Int.MaxValue,
        "LPC residual out of 32-bit range")
      r.toInt
    }
    writeRiceResidual(w, res)
  }

  /** Levinson-Durbin over the block's autocorrelation, quantized to
    * signed `precision`-bit coefficients with a power-of-two shift.
    * Doubles appear ONLY here, in coefficient CHOICE — a degenerate
    * or ill-conditioned block falls back to all-zero coefficients
    * (residual = the samples themselves), still lossless. */
  private def quantizedLpc(s: Array[Int], off: Int, bs: Int,
                           order: Int, precision: Int)
      : (Array[Int], Int) = {
    val ac = new Array[Double](order + 1)
    var lag = 0
    while (lag <= order) {
      var sum = 0.0
      var i = lag
      while (i < bs) {
        sum += s(off + i).toDouble * s(off + i - lag); i += 1
      }
      ac(lag) = sum
      lag += 1
    }
    val lpc = new Array[Double](order)
    var err = ac(0)
    var i = 0
    var ok = err > 0.0
    while (ok && i < order) {
      var acc = ac(i + 1)
      var j = 0
      while (j < i) { acc -= lpc(j) * ac(i - j); j += 1 }
      val kr = acc / err
      // reflect the existing coefficients around the new one
      var a = 0
      val half = i / 2
      while (a < half) {
        val tmp = lpc(a)
        lpc(a) = tmp - kr * lpc(i - 1 - a)
        lpc(i - 1 - a) -= kr * tmp
        a += 1
      }
      if (i % 2 == 1) lpc(half) -= kr * lpc(half)
      lpc(i) = kr
      err *= 1.0 - kr * kr
      if (java.lang.Double.isNaN(kr) || !(err > 0.0)) ok = false
      i += 1
    }
    var cmax = 0.0
    lpc.foreach { c =>
      val a = math.abs(c)
      if (java.lang.Double.isNaN(a) || a > cmax) cmax =
        if (java.lang.Double.isNaN(a)) Double.NaN else a
    }
    if (!(cmax > 0.0) || java.lang.Double.isInfinite(cmax) ||
      java.lang.Double.isNaN(cmax))
      (new Array[Int](order), 0)
    else {
      val e = math.getExponent(cmax) // floor(log2 cmax)
      val shift = math.max(0, math.min(15, precision - 2 - e))
      val lim = 1 << (precision - 1)
      val q = lpc.map { c =>
        val v = math.round(c * (1L << shift).toDouble)
        math.max(-lim.toLong, math.min((lim - 1).toLong, v)).toInt
      }
      (q, shift)
    }
  }

  /** Partition-order-0 rice residual: 4-bit parameter sized to bound
    * unary runs at 15, with the spec's escape-to-raw partition when
    * the residual range exceeds the 4-bit rice parameter space. */
  private def writeRiceResidual(w: BitWriter, res: Array[Int]): Unit = {
    w.u(0, 2) // residual method: 4-bit rice
    w.u(0, 4) // partition order 0
    val maxU = res.foldLeft(0L)((m, r) => math.max(m, zigzag(r)))
    val bitsNeeded = 64 - java.lang.Long.numberOfLeadingZeros(
      math.max(maxU, 1L))
    val p = math.max(0, bitsNeeded - 4) // bounds unary runs at 15
    if (p <= 14) {
      w.u(p.toLong, 4)
      res.foreach { r =>
        val u = zigzag(r)
        w.unary((u >> p).toInt)
        w.u(u & ((1L << p) - 1), p)
      }
    } else {
      // high-order predictors on wrapping signals can exceed the
      // 4-bit rice range — use the spec's escape-to-raw partition
      def signedBits(r: Int): Int =
        64 - java.lang.Long.numberOfLeadingZeros(
          if (r < 0) ~r.toLong else r.toLong).toInt + 1
      val rawBits = res.foldLeft(1)((m, r) =>
        math.max(m, signedBits(r)))
      require(rawBits <= 31, "raw residual width out of range")
      w.u(0xfL, 4) // escape
      w.u(rawBits.toLong, 5)
      res.foreach(r =>
        w.u(r.toLong & ((1L << rawBits) - 1), rawBits))
    }
  }

  /** Spec hook: a mono stream whose every frame is an LPC subframe
    * with EXACTLY the given coefficients/shift/precision — lets the
    * test suite pin the bit layout and reconstruction arithmetic
    * against hand-authored expectations. */
  private[graft] def encodePinnedLpc(samples: Array[Int],
                                     qcoef: Array[Int], shift: Int,
                                     precision: Int): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    out ++= "fLaC".getBytes("US-ASCII")
    val si = new BitWriter
    si.u(1, 1); si.u(0, 7); si.u(34, 24)
    si.u(BlockSize.toLong, 16); si.u(BlockSize.toLong, 16)
    si.u(0, 24); si.u(0, 24)
    si.u(8000, 20); si.u(0, 3); si.u(15, 5)
    si.u(samples.length.toLong, 36)
    si.alignZero()
    out ++= si.buf
    out ++= sampleMd5(samples)
    var frameIdx = 0
    var off = 0
    while (off < samples.length) {
      val bs = math.min(BlockSize, samples.length - off)
      val w = new BitWriter
      w.u(0x3ffeL, 14); w.u(0, 1); w.u(0, 1)
      val bsCode = if (bs == BlockSize) 8L else 7L
      w.u(bsCode, 4); w.u(0, 4); w.u(0, 4); w.u(4, 3); w.u(0, 1)
      codedNumber(w, frameIdx)
      if (bsCode == 7L) w.u((bs - 1).toLong, 16)
      w.alignZero()
      w.buf += crc8(w.buf.toArray, 0, w.buf.length).toByte
      writeSubframe(w, samples, off, bs, 16, fixedOrder = 1,
        verbatim = false, lpcOrder = 0,
        pinnedLpc = Some((qcoef, shift, precision)))
      w.alignZero()
      val body = w.buf
      val c16 = crc16(body.toArray, 0, body.length)
      body += ((c16 >> 8) & 0xff).toByte
      body += (c16 & 0xff).toByte
      out ++= body
      off += bs
      frameIdx += 1
    }
    out.toArray
  }

  /** Encode STEREO 16-bit at 8 kHz: per-frame channel decorrelation —
    * MID/SIDE (assignment 0b1010: mid = (L+R)>>1 at 16 bits, side =
    * L−R at 17) where `midSide` marks the frame, INDEPENDENT L/R
    * (0b0001) otherwise. The reconstruction is exact integer
    * arithmetic: (mid<<1)|(side&1) restores L+R, so both channels
    * roundtrip losslessly; the STREAMINFO MD5 hashes the
    * channel-interleaved little-endian samples. */
  def encodeStereo(left: Array[Int], right: Array[Int],
                   fixedOrder: Int = 1,
                   midSide: Int => Boolean = _ => true,
                   lpcOrder: Int = 0): Array[Byte] = {
    require(left.length == right.length, "channel length mismatch")
    val n = left.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    out ++= "fLaC".getBytes("US-ASCII")
    val si = new BitWriter
    si.u(1, 1); si.u(0, 7); si.u(34, 24)
    si.u(BlockSize.toLong, 16); si.u(BlockSize.toLong, 16)
    si.u(0, 24); si.u(0, 24)
    si.u(8000, 20)
    si.u(1, 3) // channels - 1
    si.u(15, 5)
    si.u(n.toLong, 36)
    si.alignZero()
    out ++= si.buf
    val inter = new Array[Int](2 * n)
    for (i <- 0 until n) { inter(2 * i) = left(i); inter(2 * i + 1) = right(i) }
    out ++= sampleMd5(inter)
    var frameIdx = 0
    var off = 0
    while (off < n) {
      val bs = math.min(BlockSize, n - off)
      val w = new BitWriter
      w.u(0x3ffeL, 14); w.u(0, 1); w.u(0, 1)
      val bsCode = if (bs == BlockSize) 8L else 7L
      w.u(bsCode, 4)
      w.u(0, 4)
      val ms = midSide(frameIdx)
      w.u(if (ms) 10L else 1L, 4) // mid/side vs independent
      w.u(4, 3); w.u(0, 1)
      codedNumber(w, frameIdx)
      if (bsCode == 7L) w.u((bs - 1).toLong, 16)
      w.alignZero()
      w.buf += crc8(w.buf.toArray, 0, w.buf.length).toByte
      if (ms) {
        val mid = Array.tabulate(bs)(i =>
          (left(off + i) + right(off + i)) >> 1)
        val side = Array.tabulate(bs)(i =>
          left(off + i) - right(off + i))
        writeSubframe(w, mid, 0, bs, 16, fixedOrder, verbatim = false,
          lpcOrder)
        writeSubframe(w, side, 0, bs, 17, fixedOrder, verbatim = false,
          lpcOrder)
      } else {
        writeSubframe(w, left, off, bs, 16, fixedOrder,
          verbatim = false, lpcOrder)
        writeSubframe(w, right, off, bs, 16, fixedOrder,
          verbatim = false, lpcOrder)
      }
      w.alignZero()
      val body = w.buf
      val c16 = crc16(body.toArray, 0, body.length)
      body += ((c16 >> 8) & 0xff).toByte
      body += (c16 & 0xff).toByte
      out ++= body
      off += bs
      frameIdx += 1
    }
    out.toArray
  }

  private def zigzag(r: Int): Long =
    if (r >= 0) 2L * r else -2L * r.toLong - 1L

  private def unzigzag(u: Long): Int =
    if ((u & 1L) == 0L) (u >> 1).toInt else (-((u + 1L) >> 1)).toInt

  /** Order-k fixed-predictor residuals (the k-th difference). */
  private def residual(s: Array[Int], off: Int, bs: Int,
                       k: Int): Array[Int] =
    Array.tabulate(bs - k) { j =>
      val i = off + k + j
      k match {
        case 0 => s(i)
        case 1 => s(i) - s(i - 1)
        case 2 => s(i) - 2 * s(i - 1) + s(i - 2)
        case 3 => s(i) - 3 * s(i - 1) + 3 * s(i - 2) - s(i - 3)
        case 4 => s(i) - 4 * s(i - 1) + 6 * s(i - 2) - 4 * s(i - 3) +
          s(i - 4)
      }
    }

  // ---------------------------------------------------------- decode
  /** Decode a mono 16-bit FLAC stream; verifies the header CRC-8 of
    * every frame, each frame's CRC-16, and the STREAMINFO MD5 of the
    * reassembled samples. */
  def decode(bytes: Array[Byte]): Array[Int] = {
    val (meta, framesAt) = parseMetadata(bytes)
    require(meta.channels == 1,
      s"FLAC: expected mono, STREAMINFO says ${meta.channels} — " +
        "use decodeStereo")
    val total = meta.total
    var pos = framesAt
    val out = new Array[Int](total.toInt)
    var got = 0
    var expectIdx = 0
    while (got < total) {
      val (n, next) = decodeFrame(bytes, pos, out, got, expectIdx)
      got += n
      pos = next
      expectIdx += 1
    }
    val md = sampleMd5(out)
    require(java.util.Arrays.equals(md, meta.md5),
      "FLAC: MD5 mismatch — decoded audio does not match STREAMINFO")
    out
  }

  private def readCodedNumber(r: BitReader): Int = {
    val b0 = r.u(8).toInt
    if ((b0 & 0x80) == 0) b0
    else if ((b0 & 0xe0) == 0xc0) {
      val b1 = r.u(8).toInt
      require((b1 & 0xc0) == 0x80, "FLAC: bad coded number")
      ((b0 & 0x1f) << 6) | (b1 & 0x3f)
    } else if ((b0 & 0xf0) == 0xe0) {
      val b1 = r.u(8).toInt; val b2 = r.u(8).toInt
      require((b1 & 0xc0) == 0x80 && (b2 & 0xc0) == 0x80,
        "FLAC: bad coded number")
      ((b0 & 0x0f) << 12) | ((b1 & 0x3f) << 6) | (b2 & 0x3f)
    } else throw new IllegalArgumentException(
      "FLAC: coded number form unsupported")
  }

  /** One subframe at `bits` width into a fresh array. */
  private def readSubframe(r: BitReader, bs: Int,
                           bits: Int): Array[Int] = {
    val out = new Array[Int](bs)
    require(r.u(1) == 0L, "FLAC: subframe padding bit set")
    val stype = r.u(6).toInt
    val wasted = r.u(1).toInt
    require(wasted == 0, "FLAC: wasted-bits subframes unsupported")
    if (stype == 0) { // CONSTANT
      java.util.Arrays.fill(out, signExtend(r.u(bits), bits))
    } else if (stype == 1) { // VERBATIM
      for (i <- 0 until bs) out(i) = signExtend(r.u(bits), bits)
    } else if (stype >= 8 && stype <= 12) { // FIXED order k
      val k = stype - 8
      for (i <- 0 until k) out(i) = signExtend(r.u(bits), bits)
      readRiceResidual(r, bs, k, out)
      // reconstruct the fixed prediction in place
      for (j <- k until bs) {
        k match {
          case 0 => ()
          case 1 => out(j) += out(j - 1)
          case 2 => out(j) += 2 * out(j - 1) - out(j - 2)
          case 3 => out(j) += 3 * out(j - 1) - 3 * out(j - 2) +
            out(j - 3)
          case 4 => out(j) += 4 * out(j - 1) - 6 * out(j - 2) +
            4 * out(j - 3) - out(j - 4)
        }
      }
    } else if (stype >= 32) { // LPC order k = stype − 31
      val k = stype - 31
      require(k < bs, s"FLAC: LPC order $k exceeds block size $bs")
      for (i <- 0 until k) out(i) = signExtend(r.u(bits), bits)
      val precRaw = r.u(4).toInt
      require(precRaw != 0xf,
        "FLAC: invalid LPC precision code 0b1111")
      val precision = precRaw + 1
      val shift = signExtend(r.u(5), 5)
      require(shift >= 0, "FLAC: negative LPC shift unsupported")
      val coef = Array.fill(k)(signExtend(r.u(precision), precision))
      readRiceResidual(r, bs, k, out)
      // s(n) = res(n) + ((Σ c_j·s(n-1-j)) >> shift), 64-bit sums
      var j = k
      while (j < bs) {
        var acc = 0L
        var c = 0
        while (c < k) { acc += coef(c).toLong * out(j - 1 - c); c += 1 }
        out(j) += (acc >> shift).toInt
        j += 1
      }
    }
    else throw new IllegalArgumentException(
      s"FLAC: reserved subframe type $stype")
    out
  }

  /** Rice-partitioned residual into `out(k until bs)` — shared by the
    * FIXED and LPC subframe readers. Handles both the 4-bit (method
    * 0) and 5-bit (method 1) parameter widths, multi-partition
    * layouts, and escaped raw partitions (including 0-width = all
    * zero). */
  private def readRiceResidual(r: BitReader, bs: Int, k: Int,
                               out: Array[Int]): Unit = {
    val method = r.u(2).toInt
    require(method == 0 || method == 1,
      s"FLAC: reserved residual method $method")
    val pBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 0xf else 0x1f
    val partOrder = r.u(4).toInt
    val nParts = 1 << partOrder
    require(bs % nParts == 0, "FLAC: partition does not divide block")
    var i = k
    for (part <- 0 until nParts) {
      val count = (bs >> partOrder) - (if (part == 0) k else 0)
      val p = r.u(pBits).toInt
      if (p == escape) {
        val raw = r.u(5).toInt
        for (_ <- 0 until count) {
          out(i) = if (raw == 0) 0 else signExtend(r.u(raw), raw)
          i += 1
        }
      } else {
        for (_ <- 0 until count) {
          val q = r.unary()
          val u = (q.toLong << p) | r.u(p)
          out(i) = unzigzag(u)
          i += 1
        }
      }
    }
  }

  private def decodeFrame(bytes: Array[Byte], start: Int,
                          out: Array[Int], outOff: Int,
                          expectIdx: Int): (Int, Int) = {
    val (chs, bs, next) = decodeFrameChannels(bytes, start, expectIdx,
      expectChannels = 1)
    System.arraycopy(chs(0), 0, out, outOff, bs)
    (bs, next)
  }

  /** Frame decode for 1 or 2 declared channels; returns the decoded
    * channel arrays, the block size, and the next byte position.
    * Stereo decorrelation modes: independent (0b0001), left/side
    * (0b1000), right/side (0b1001), mid/side (0b1010) — all exact
    * integer reconstructions; the SIDE channel reads bits+1. */
  private def decodeFrameChannels(bytes: Array[Byte], start: Int,
                                  expectIdx: Int, expectChannels: Int)
      : (Array[Array[Int]], Int, Int) = {
    val r = new BitReader(bytes, start)
    require(r.u(14) == 0x3ffeL, "FLAC: lost frame sync")
    require(r.u(1) == 0L, "FLAC: reserved bit set")
    require(r.u(1) == 0L, "FLAC: variable-blocksize streams unsupported")
    val bsCode = r.u(4).toInt
    val srCode = r.u(4).toInt
    val chan = r.u(4).toInt
    val ssCode = r.u(3).toInt
    r.u(1)
    require(ssCode == 4, "FLAC: 16-bit frames only")
    require(srCode == 0, "FLAC: expected sample rate from STREAMINFO")
    val nCh = if (chan == 0) 1 else 2
    require(nCh == expectChannels,
      s"FLAC: frame channel assignment $chan does not match STREAMINFO")
    require(chan == 0 || chan == 1 || (chan >= 8 && chan <= 10),
      s"FLAC: unsupported channel assignment $chan")
    val idx = readCodedNumber(r)
    require(idx == expectIdx,
      s"FLAC: frame number $idx, expected $expectIdx")
    val bs = bsCode match {
      case 8 => BlockSize
      case 7 => r.u(16).toInt + 1
      case 6 => r.u(8).toInt + 1
      case c if c >= 2 && c <= 5 => 576 << (c - 2)
      case c if c >= 9 => 256 << (c - 8)
      case 1 => 192
      case _ => throw new IllegalArgumentException(
        s"FLAC: reserved blocksize code $bsCode")
    }
    require(r.aligned, "FLAC: header not byte aligned")
    val headerCrc = crc8(bytes, start, r.pos)
    require(r.u(8).toInt == headerCrc,
      "FLAC: frame header CRC-8 mismatch")
    val chs: Array[Array[Int]] = chan match {
      case 0 => Array(readSubframe(r, bs, 16))
      case 1 => Array(readSubframe(r, bs, 16), readSubframe(r, bs, 16))
      case 8 => // left/side: R = L - side
        val l = readSubframe(r, bs, 16)
        val s = readSubframe(r, bs, 17)
        Array(l, Array.tabulate(bs)(i => l(i) - s(i)))
      case 9 => // right/side: L = R + side
        val s = readSubframe(r, bs, 17)
        val rr = readSubframe(r, bs, 16)
        Array(Array.tabulate(bs)(i => rr(i) + s(i)), rr)
      case 10 => // mid/side: (mid<<1)|(side&1) restores L+R exactly
        val m = readSubframe(r, bs, 16)
        val s = readSubframe(r, bs, 17)
        val l = Array.tabulate(bs) { i =>
          val sum = (m(i) << 1) | (s(i) & 1)
          (sum + s(i)) >> 1
        }
        val rr = Array.tabulate(bs) { i =>
          val sum = (m(i) << 1) | (s(i) & 1)
          (sum - s(i)) >> 1
        }
        Array(l, rr)
    }
    r.align()
    val frameCrc = crc16(bytes, start, r.pos)
    require(r.u(16).toInt == frameCrc, "FLAC: frame CRC-16 mismatch")
    (chs, bs, r.pos)
  }

  /** Decode a STEREO stream to (left, right); the STREAMINFO MD5 is
    * verified over the channel-interleaved reassembly. */
  def decodeStereo(bytes: Array[Byte]): (Array[Int], Array[Int]) = {
    val (meta, framesAt) = parseMetadata(bytes)
    require(meta.channels == 2,
      s"FLAC: expected stereo, STREAMINFO says ${meta.channels}")
    val n = meta.total.toInt
    val left = new Array[Int](n)
    val right = new Array[Int](n)
    var got = 0
    var pos = framesAt
    var expectIdx = 0
    while (got < n) {
      val (chs, bs, next) = decodeFrameChannels(bytes, pos, expectIdx,
        expectChannels = 2)
      System.arraycopy(chs(0), 0, left, got, bs)
      System.arraycopy(chs(1), 0, right, got, bs)
      got += bs
      pos = next
      expectIdx += 1
    }
    val inter = new Array[Int](2 * n)
    for (i <- 0 until n) { inter(2 * i) = left(i); inter(2 * i + 1) = right(i) }
    require(java.util.Arrays.equals(sampleMd5(inter), meta.md5),
      "FLAC: MD5 mismatch — decoded audio does not match STREAMINFO")
    (left, right)
  }

  private case class StreamMeta(channels: Int, total: Long,
                                md5: Array[Byte])

  private def parseMetadata(bytes: Array[Byte]): (StreamMeta, Int) = {
    require(bytes.length >= 4 &&
      new String(bytes, 0, 4, "US-ASCII") == "fLaC",
      "FLAC: bad stream marker")
    var pos = 4
    var last = false
    var meta: StreamMeta = null
    while (!last) {
      require(pos + 4 <= bytes.length, "FLAC: truncated metadata")
      val hdr = bytes(pos) & 0xff
      last = (hdr & 0x80) != 0
      val btype = hdr & 0x7f
      val len = ((bytes(pos + 1) & 0xff) << 16) |
        ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
      pos += 4
      require(pos + len <= bytes.length, "FLAC: truncated metadata body")
      if (btype == 0) {
        val r = new BitReader(bytes, pos)
        val minBs = r.u(16); val maxBs = r.u(16)
        require(minBs == BlockSize && maxBs == BlockSize,
          s"FLAC: unsupported blocksize $minBs..$maxBs " +
            s"(fixed $BlockSize only)")
        r.u(24); r.u(24)
        val rate = r.u(20)
        require(rate == 8000, s"FLAC: unsupported sample rate $rate")
        val ch = r.u(3).toInt + 1
        require(ch <= 2, s"FLAC: $ch channels unsupported")
        val bps = r.u(5)
        require(bps == 15, "FLAC: 16-bit samples only")
        val total = r.u(36)
        meta = StreamMeta(ch, total, bytes.slice(pos + 18, pos + 34))
      }
      pos += len
    }
    require(meta != null, "FLAC: missing STREAMINFO")
    (meta, pos)
  }
}
