package graft.ext

/** Pure-JVM baseline JPEG (JFIF) codec — the last practitioner-visible
  * multimodal format (VERDICT r12 #1): web-scraped image corpora are
  * overwhelmingly JPEG, and the engine's codec seam
  * ([[Multimodal.decodeFrames]]) handed compressed blobs to a stub
  * until now. Mirrors how [[PngCodec]] closed the DEFLATE gap: a real
  * entropy-coded format implemented from the public spec (ITU-T T.81 /
  * ISO 10918-1), no external libraries.
  *
  * Decoder: marker walk (APPn/COM skipped), DQT (8/16-bit precision),
  * DHT (canonical Huffman per F.2.2.3), SOF0/SOF1 AND PROGRESSIVE
  * SOF2 with arbitrary sampling factors h,v ∈ {1,2} (4:4:4, 4:2:2,
  * 4:2:0, grayscale), DRI + RSTn restart handling, the entropy-coded
  * scans (byte unstuffing, DC prediction, RECEIVE/EXTEND magnitude
  * decode, ZRL/EOB run-length; for progressive: spectral-selection
  * bands, successive-approximation DC/AC first + refinement passes,
  * EOBn run coding, non-interleaved per-component block grids),
  * dequantize + dezigzag, separable double IDCT, level shift + clamp.
  * Arithmetic-coded and hierarchical/lossless streams are rejected
  * with a clear error — fail-fast, same contract as the other codecs.
  *
  * Encoder: the matching baseline writer (used by the gates and specs;
  * tables travel in-stream, so decode correctness never depends on the
  * encoder's table choice): level shift, FDCT, quantize, zigzag,
  * DC-difference + AC run-length Huffman coding with the Annex K
  * tables, byte stuffing, JFIF headers.
  *
  * Exactness contract for the oracle gate (e174): an 8×8-block-constant
  * plane has DC = 8·(c−128) and exactly zero AC; choosing c so the DC
  * divides its quantizer step (even c for luma q₀₀=16, c = 128+17m for
  * chroma q₀₀=17) makes quantization lossless and the full
  * encode→decode pipeline returns c bit-exactly — so the DuckDB oracle
  * evaluates the pattern formula directly, and any Huffman / zigzag /
  * MCU-layout / plane-stride bug breaks the hash. General content
  * (nonzero AC) is covered by the spec's ImageIO cross-decodes and
  * unit-quantizer roundtrip bounds.
  *
  * Scale shape: all entry points are byte-array → byte-array/planes,
  * called partition-local behind the [[Multimodal]] mapPartitions seam
  * — decode never shuffles.
  */
object JpegCodec {

  /** zigzag position → natural (row-major) index, generated (not
    * transcribed) so it cannot carry a typo. */
  val ZigZag: Array[Int] = {
    val order = Array.ofDim[Int](64)
    var x = 0; var y = 0
    for (i <- 0 until 64) {
      order(i) = y * 8 + x
      if ((x + y) % 2 == 0) {
        if (x == 7) y += 1 else if (y == 0) x += 1 else { x += 1; y -= 1 }
      } else {
        if (y == 7) x += 1 else if (x == 0) y += 1 else { x -= 1; y += 1 }
      }
    }
    order
  }

  /** Annex K quantization tables (natural order), quality 50. */
  val StdQuantLum: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)
  val StdQuantChr: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** Annex K Huffman table specs: (codes-per-length[1..16], symbols). */
  private val DcLumBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = (0 to 11).map(_.toByte).toArray
  private val DcChrBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChrVals = (0 to 11).map(_.toByte).toArray
  private val AcLumBits =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa).map(_.toByte)
  private val AcChrBits =
    Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChrVals: Array[Byte] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa).map(_.toByte)

  // ---------------------------------------------------------------
  // Canonical Huffman (T.81 Annex C): codes assigned in symbol order,
  // shorter lengths first, each length starting at (prev+1)<<1.
  // ---------------------------------------------------------------

  private final class HuffEncoder(bits: Array[Int], vals: Array[Byte]) {
    require(bits.length == 16 && vals.length == bits.sum,
      s"invalid Huffman spec: ${vals.length} symbols vs ${bits.sum} codes")
    val codeOf = new Array[Int](256)
    val lenOf = new Array[Int](256)
    locally {
      var code = 0; var k = 0
      for (l <- 1 to 16) {
        for (_ <- 0 until bits(l - 1)) {
          val sym = vals(k) & 0xff
          codeOf(sym) = code; lenOf(sym) = l
          code += 1; k += 1
        }
        code <<= 1
      }
    }
  }

  /** Decode tables per F.2.2.3: mincode/maxcode/valptr indexed by
    * code length. */
  private final class HuffDecoder(bits: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      for (l <- 1 to 16) {
        if (bits(l - 1) == 0) { maxCode(l) = -1 }
        else {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1); k += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
      }
      require(k == vals.length, "DHT symbol count mismatch")
    }
    def decode(br: BitReader): Int = {
      var code = br.readBit()
      var l = 1
      while (l <= 16 && (maxCode(l) == -1 || code > maxCode(l))) {
        code = (code << 1) | br.readBit()
        l += 1
      }
      if (l > 16) throw new IllegalArgumentException(
        "JPEG: invalid Huffman code in entropy-coded segment")
      vals(valPtr(l) + (code - minCode(l))) & 0xff
    }
  }

  // ---------------------------------------------------------------
  // Bit I/O with 0xFF byte stuffing/unstuffing
  // ---------------------------------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0; private var nBits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nBits += 1
        if (nBits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00)
          acc = 0; nBits = 0
        }
        i -= 1
      }
    }
    /** Flush, padding with 1-bits (T.81 F.1.2.3). */
    def finish(): Unit = if (nBits > 0) put(0xff, 8 - nBits)
  }

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0; private var nBits = 0
    def readBit(): Int = {
      if (nBits == 0) refill()
      nBits -= 1
      (acc >> nBits) & 1
    }
    private def refill(): Unit = {
      if (pos >= data.length)
        throw new IllegalArgumentException("JPEG: truncated scan data")
      var b = data(pos) & 0xff; pos += 1
      if (b == 0xff) {
        if (pos >= data.length)
          throw new IllegalArgumentException("JPEG: truncated scan data")
        val m = data(pos) & 0xff; pos += 1
        if (m == 0x00) () // stuffed 0xFF data byte
        else if (m >= 0xd0 && m <= 0xd7) {
          // A valid stream never requests entropy bits across a restart
          // marker: RSTn is byte-aligned at an MCU-interval boundary and
          // the MCU loop realigns (restartIfDue) before the next read.
          // Reaching one mid-refill means the interval's entropy data is
          // truncated (or the RSTn is stray, restartInterval==0) — fail
          // fast per the codec contract instead of feeding fake bits.
          throw new IllegalArgumentException(
            f"JPEG: restart marker 0xff$m%02x mid-entropy-decode " +
              "(truncated restart interval or stray RSTn)")
        } else throw new IllegalArgumentException(
          f"JPEG: unexpected marker 0xff$m%02x inside scan")
      }
      acc = b; nBits = 8
    }
    /** Drop partial-byte bits (restart realignment). */
    def align(): Unit = nBits = 0
  }

  /** RECEIVE+EXTEND (T.81 F.2.2.1): read `s` magnitude bits, map to
    * the signed value. */
  private def extend(br: BitReader, s: Int): Int = {
    if (s == 0) 0
    else {
      var v = 0
      var i = 0
      while (i < s) { v = (v << 1) | br.readBit(); i += 1 }
      if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
    }
  }

  private def bitSize(v: Int): Int = {
    var a = math.abs(v); var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  // ---------------------------------------------------------------
  // Separable double-precision DCT-II / DCT-III (T.81 A.3.3)
  // ---------------------------------------------------------------

  private val CosTab: Array[Double] = {
    val t = new Array[Double](64)
    for (x <- 0 until 8; u <- 0 until 8)
      t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
    t
  }
  private val C0 = 1.0 / math.sqrt(2.0)

  /** Forward DCT of a level-shifted 8×8 block (natural order in/out). */
  private def fdct(b: Array[Double]): Array[Double] = {
    val tmp = new Array[Double](64)
    val out = new Array[Double](64)
    // rows
    for (y <- 0 until 8; u <- 0 until 8) {
      var s = 0.0
      var x = 0
      while (x < 8) { s += b(y * 8 + x) * CosTab(x * 8 + u); x += 1 }
      tmp(y * 8 + u) = s * (if (u == 0) C0 else 1.0) / 2.0
    }
    // columns
    for (v <- 0 until 8; u <- 0 until 8) {
      var s = 0.0
      var y = 0
      while (y < 8) { s += tmp(y * 8 + u) * CosTab(y * 8 + v); y += 1 }
      out(v * 8 + u) = s * (if (v == 0) C0 else 1.0) / 2.0
    }
    out
  }

  /** Inverse DCT (natural order in/out), output still level-shifted. */
  private def idct(c: Array[Double]): Array[Double] = {
    val tmp = new Array[Double](64)
    val out = new Array[Double](64)
    for (v <- 0 until 8; x <- 0 until 8) {
      var s = 0.0
      var u = 0
      while (u < 8) {
        s += (if (u == 0) C0 else 1.0) * c(v * 8 + u) * CosTab(x * 8 + u)
        u += 1
      }
      tmp(v * 8 + x) = s / 2.0
    }
    for (y <- 0 until 8; x <- 0 until 8) {
      var s = 0.0
      var v = 0
      while (v < 8) {
        s += (if (v == 0) C0 else 1.0) * tmp(v * 8 + x) * CosTab(y * 8 + v)
        v += 1
      }
      out(y * 8 + x) = s / 2.0
    }
    out
  }

  // ---------------------------------------------------------------
  // Encoder
  // ---------------------------------------------------------------

  private def u16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >> 8) & 0xff); out.write(v & 0xff)
  }
  private def marker(out: java.io.ByteArrayOutputStream, m: Int): Unit = {
    out.write(0xff); out.write(m)
  }

  private def writeDqt(out: java.io.ByteArrayOutputStream, id: Int,
                       q: Array[Int]): Unit = {
    marker(out, 0xdb); u16(out, 2 + 1 + 64)
    out.write(id) // Pq=0 (8-bit) | Tq
    var i = 0
    while (i < 64) { out.write(q(ZigZag(i))); i += 1 }
  }

  private def writeDht(out: java.io.ByteArrayOutputStream, tcTh: Int,
                       bits: Array[Int], vals: Array[Byte]): Unit = {
    marker(out, 0xc4); u16(out, 2 + 1 + 16 + vals.length)
    out.write(tcTh)
    bits.foreach(out.write)
    out.write(vals, 0, vals.length)
  }

  /** Encode one component block: sample the (possibly edge-replicated)
    * plane, FDCT, quantize, Huffman-code. Returns the new DC
    * predictor. */
  private def encodeBlock(plane: Array[Int], pw: Int, ph: Int,
                          x0: Int, y0: Int, q: Array[Int], dcPred: Int,
                          dc: HuffEncoder, ac: HuffEncoder,
                          bw: BitWriter): Int = {
    val blk = new Array[Double](64)
    var i = 0
    while (i < 64) {
      val x = math.min(x0 + i % 8, pw - 1)
      val y = math.min(y0 + i / 8, ph - 1)
      blk(i) = plane(y * pw + x) - 128.0
      i += 1
    }
    val coef = fdct(blk)
    val qz = new Array[Int](64)
    i = 0
    while (i < 64) {
      val nat = ZigZag(i)
      qz(i) = math.round(coef(nat) / q(nat)).toInt
      i += 1
    }
    // DC difference
    val diff = qz(0) - dcPred
    val s = bitSize(diff)
    bw.put(dc.codeOf(s), dc.lenOf(s))
    if (s > 0)
      bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
    // AC run-length
    var run = 0
    i = 1
    while (i < 64) {
      if (qz(i) == 0) run += 1
      else {
        while (run >= 16) { bw.put(ac.codeOf(0xf0), ac.lenOf(0xf0)); run -= 16 }
        val sz = bitSize(qz(i))
        val sym = (run << 4) | sz
        bw.put(ac.codeOf(sym), ac.lenOf(sym))
        bw.put(if (qz(i) < 0) qz(i) + (1 << sz) - 1 else qz(i), sz)
        run = 0
      }
      i += 1
    }
    if (run > 0) bw.put(ac.codeOf(0x00), ac.lenOf(0x00)) // EOB
    qz(0)
  }

  private def writeHeaders(out: java.io.ByteArrayOutputStream, w: Int,
                           h: Int, gray: Boolean, qLum: Array[Int],
                           qChr: Array[Int]): Unit = {
    marker(out, 0xd8) // SOI
    marker(out, 0xe0) // APP0 JFIF
    u16(out, 16)
    out.write(Array('J', 'F', 'I', 'F', 0).map(_.toByte), 0, 5)
    out.write(1); out.write(1) // version 1.1
    out.write(0) // aspect-ratio units
    u16(out, 1); u16(out, 1) // density 1:1
    out.write(0); out.write(0) // no thumbnail
    writeDqt(out, 0, qLum)
    if (!gray) writeDqt(out, 1, qChr)
    marker(out, 0xc0) // SOF0 baseline
    val nc = if (gray) 1 else 3
    u16(out, 8 + 3 * nc)
    out.write(8); u16(out, h); u16(out, w); out.write(nc)
    if (gray) { out.write(1); out.write(0x11); out.write(0) }
    else {
      out.write(1); out.write(0x22); out.write(0) // Y 2x2, qtab 0
      out.write(2); out.write(0x11); out.write(1) // Cb 1x1, qtab 1
      out.write(3); out.write(0x11); out.write(1) // Cr 1x1, qtab 1
    }
    writeDht(out, 0x00, DcLumBits, DcLumVals)
    writeDht(out, 0x10, AcLumBits, AcLumVals)
    if (!gray) {
      writeDht(out, 0x01, DcChrBits, DcChrVals)
      writeDht(out, 0x11, AcChrBits, AcChrVals)
    }
    marker(out, 0xda) // SOS
    u16(out, 6 + 2 * nc)
    out.write(nc)
    out.write(1); out.write(0x00)
    if (!gray) { out.write(2); out.write(0x11); out.write(3); out.write(0x11) }
    out.write(0); out.write(63); out.write(0) // Ss, Se, Ah/Al
  }

  /** Encode a grayscale baseline JPEG from an 8-bit luma plane
    * (row-major, values 0..255). Arbitrary dims — edge pixels
    * replicate into partial blocks. */
  def encodeGray(w: Int, h: Int, y: Array[Int],
                 qLum: Array[Int] = StdQuantLum): Array[Byte] = {
    require(w > 0 && h > 0 && y.length == w * h, "bad plane dims")
    val out = new java.io.ByteArrayOutputStream()
    writeHeaders(out, w, h, gray = true, qLum, StdQuantChr)
    val dcT = new HuffEncoder(DcLumBits, DcLumVals)
    val acT = new HuffEncoder(AcLumBits, AcLumVals)
    val bw = new BitWriter(out)
    var dcPred = 0
    for (by <- 0 until (h + 7) / 8; bx <- 0 until (w + 7) / 8)
      dcPred = encodeBlock(y, w, h, bx * 8, by * 8, qLum, dcPred,
        dcT, acT, bw)
    bw.finish()
    marker(out, 0xd9) // EOI
    out.toByteArray
  }

  /** Encode a 4:2:0 color baseline JPEG from YCbCr planes (luma w×h,
    * chroma ⌈w/2⌉×⌈h/2⌉, row-major 0..255). Arbitrary dims — edges
    * replicate into partial MCUs. */
  def encode420(w: Int, h: Int, y: Array[Int], cb: Array[Int],
                cr: Array[Int], qLum: Array[Int] = StdQuantLum,
                qChr: Array[Int] = StdQuantChr): Array[Byte] =
    encodeSubsampled(w, h, y, cb, cr, 2, 2, qLum, qChr)

  /** Encode a color baseline JPEG with luma sampling factors
    * (hs, vs) ∈ {1,2}² — 4:4:4 (1,1), 4:2:2 (2,1), 4:4:0 (1,2),
    * 4:2:0 (2,2); chroma planes are ⌈w/hs⌉ × ⌈h/vs⌉. One MCU is
    * hs×vs luma blocks + one block per chroma component. */
  def encodeSubsampled(w: Int, h: Int, y: Array[Int], cb: Array[Int],
      cr: Array[Int], hs: Int, vs: Int,
      qLum: Array[Int] = StdQuantLum,
      qChr: Array[Int] = StdQuantChr): Array[Byte] = {
    require(hs >= 1 && hs <= 2 && vs >= 1 && vs <= 2, "bad sampling")
    val cw = (w + hs - 1) / hs; val ch = (h + vs - 1) / vs
    require(w > 0 && h > 0 && y.length == w * h &&
      cb.length == cw * ch && cr.length == cw * ch, "bad plane dims")
    val out = new java.io.ByteArrayOutputStream()
    marker(out, 0xd8)
    marker(out, 0xe0); u16(out, 16)
    out.write(Array('J', 'F', 'I', 'F', 0).map(_.toByte), 0, 5)
    out.write(1); out.write(1); out.write(0)
    u16(out, 1); u16(out, 1); out.write(0); out.write(0)
    writeDqt(out, 0, qLum); writeDqt(out, 1, qChr)
    marker(out, 0xc0)
    u16(out, 8 + 9)
    out.write(8); u16(out, h); u16(out, w); out.write(3)
    out.write(1); out.write((hs << 4) | vs); out.write(0)
    out.write(2); out.write(0x11); out.write(1)
    out.write(3); out.write(0x11); out.write(1)
    writeDht(out, 0x00, DcLumBits, DcLumVals)
    writeDht(out, 0x10, AcLumBits, AcLumVals)
    writeDht(out, 0x01, DcChrBits, DcChrVals)
    writeDht(out, 0x11, AcChrBits, AcChrVals)
    marker(out, 0xda)
    u16(out, 6 + 6)
    out.write(3)
    out.write(1); out.write(0x00)
    out.write(2); out.write(0x11); out.write(3); out.write(0x11)
    out.write(0); out.write(63); out.write(0)
    val dcL = new HuffEncoder(DcLumBits, DcLumVals)
    val acL = new HuffEncoder(AcLumBits, AcLumVals)
    val dcC = new HuffEncoder(DcChrBits, DcChrVals)
    val acC = new HuffEncoder(AcChrBits, AcChrVals)
    val bw = new BitWriter(out)
    var pY = 0; var pCb = 0; var pCr = 0
    val mw = 8 * hs; val mh = 8 * vs
    for (my <- 0 until (h + mh - 1) / mh; mx <- 0 until (w + mw - 1) / mw) {
      for (by <- 0 until vs; bx <- 0 until hs)
        pY = encodeBlock(y, w, h, mx * mw + bx * 8, my * mh + by * 8,
          qLum, pY, dcL, acL, bw)
      pCb = encodeBlock(cb, cw, ch, mx * 8, my * 8, qChr, pCb, dcC, acC, bw)
      pCr = encodeBlock(cr, cw, ch, mx * 8, my * 8, qChr, pCr, dcC, acC, bw)
    }
    bw.finish()
    marker(out, 0xd9)
    out.toByteArray
  }

  /** The quantized zigzag coefficients of one block (encoder side). */
  private def quantizeBlock(plane: Array[Int], pw: Int, ph: Int,
                            x0: Int, y0: Int,
                            q: Array[Int]): Array[Int] = {
    val blk = new Array[Double](64)
    var i = 0
    while (i < 64) {
      val x = math.min(x0 + i % 8, pw - 1)
      val y = math.min(y0 + i / 8, ph - 1)
      blk(i) = plane(y * pw + x) - 128.0
      i += 1
    }
    val coef = fdct(blk)
    Array.tabulate(64)(k =>
      math.round(coef(ZigZag(k)) / q(ZigZag(k))).toInt)
  }

  /** AC table for the progressive writer's EOBn-run scans: the 15
    * EOBn symbols (0x00=EOB … 0xE0=EOB₁₄) at code length 4, leaving
    * the all-ones code unused per convention. */
  private val AcEobBits =
    Array(0, 0, 0, 15, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val AcEobVals: Array[Byte] =
    (0 to 14).map(r => (r << 4).toByte).toArray

  /** Encode a PROGRESSIVE (SOF2) 4:2:0 stream from block-constant
    * YCbCr planes — the e188 gate writer, exercising the decoder's
    * progressive machinery end to end with the lossless-DC pattern:
    * scan 1 = interleaved DC first pass at Al=1 (point-transformed
    * diffs), scan 2 = interleaved DC REFINEMENT (Ah=1, one bit per
    * block), scans 3–5 = per-component AC band 1–63 coded as pure
    * EOBn runs (every AC is exactly zero for block-constant input —
    * enforced, not assumed). General progressive ENCODING is not
    * claimed; general progressive DECODING is (ImageIO cross-spec). */
  def encode420Progressive(w: Int, h: Int, y: Array[Int],
      cb: Array[Int], cr: Array[Int], qLum: Array[Int] = StdQuantLum,
      qChr: Array[Int] = StdQuantChr): Array[Byte] = {
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    require(w > 0 && h > 0 && y.length == w * h &&
      cb.length == cw * ch && cr.length == cw * ch, "bad plane dims")
    val mcuX = (w + 15) / 16; val mcuY = (h + 15) / 16
    // quantized DC per block, interleaved MCU order per component
    val planes = IndexedSeq((y, w, h, qLum, 2), (cb, cw, ch, qChr, 1),
      (cr, cw, ch, qChr, 1))
    // per comp: row-major block grid of DC values
    val dcs = planes.map { case (p, pw, ph, q, f) =>
      val bw = mcuX * f; val bh = mcuY * f
      Array.tabulate(bw * bh) { b =>
        val zz = quantizeBlock(p, pw, ph, (b % bw) * 8, (b / bw) * 8, q)
        require(zz.drop(1).forall(_ == 0),
          "progressive gate writer requires block-constant planes")
        zz(0)
      }
    }
    val out = new java.io.ByteArrayOutputStream()
    marker(out, 0xd8)
    marker(out, 0xe0); u16(out, 16)
    out.write(Array('J', 'F', 'I', 'F', 0).map(_.toByte), 0, 5)
    out.write(1); out.write(1); out.write(0)
    u16(out, 1); u16(out, 1); out.write(0); out.write(0)
    writeDqt(out, 0, qLum); writeDqt(out, 1, qChr)
    marker(out, 0xc2) // SOF2: progressive
    u16(out, 8 + 9)
    out.write(8); u16(out, h); u16(out, w); out.write(3)
    out.write(1); out.write(0x22); out.write(0)
    out.write(2); out.write(0x11); out.write(1)
    out.write(3); out.write(0x11); out.write(1)
    writeDht(out, 0x00, DcLumBits, DcLumVals)
    writeDht(out, 0x01, DcChrBits, DcChrVals)
    writeDht(out, 0x10, AcEobBits, AcEobVals)
    val dcL = new HuffEncoder(DcLumBits, DcLumVals)
    val dcC = new HuffEncoder(DcChrBits, DcChrVals)
    val acE = new HuffEncoder(AcEobBits, AcEobVals)

    def sos(compSel: Seq[(Int, Int, Int)], ss: Int, se: Int,
            ahAl: Int): Unit = {
      marker(out, 0xda)
      u16(out, 6 + 2 * compSel.size)
      out.write(compSel.size)
      compSel.foreach { case (id, dcT, acT) =>
        out.write(id); out.write((dcT << 4) | acT)
      }
      out.write(ss); out.write(se); out.write(ahAl)
    }
    def putMagnitude(bw: BitWriter, huff: HuffEncoder, v: Int): Unit = {
      val s = bitSize(v)
      bw.put(huff.codeOf(s), huff.lenOf(s))
      if (s > 0) bw.put(if (v < 0) v + (1 << s) - 1 else v, s)
    }

    // scan 1: interleaved DC first pass, Al = 1 (arithmetic-shifted)
    sos(Seq((1, 0, 0), (2, 1, 0), (3, 1, 0)), 0, 0, 0x01)
    locally {
      val bw = new BitWriter(out)
      val pred = Array(0, 0, 0)
      for (my <- 0 until mcuY; mx <- 0 until mcuX) {
        for (ci <- 0 until 3) {
          val f = planes(ci)._5
          val gw = mcuX * f
          val huff = if (ci == 0) dcL else dcC
          for (by <- 0 until f; bx <- 0 until f) {
            val v = dcs(ci)((my * f + by) * gw + (mx * f + bx)) >> 1
            putMagnitude(bw, huff, v - pred(ci))
            pred(ci) = v
          }
        }
      }
      bw.finish()
    }
    // scan 2: interleaved DC refinement, Ah = 1, Al = 0 (low bit)
    sos(Seq((1, 0, 0), (2, 1, 0), (3, 1, 0)), 0, 0, 0x10)
    locally {
      val bw = new BitWriter(out)
      for (my <- 0 until mcuY; mx <- 0 until mcuX) {
        for (ci <- 0 until 3) {
          val f = planes(ci)._5
          val gw = mcuX * f
          for (by <- 0 until f; bx <- 0 until f)
            bw.put(dcs(ci)((my * f + by) * gw + (mx * f + bx)) & 1, 1)
        }
      }
      bw.finish()
    }
    // scans 3-5: per-component AC band 1..63 as one EOBn run over the
    // component's OWN (non-interleaved) block grid
    for (ci <- 0 until 3) {
      sos(Seq((ci + 1, 0, 0)), 1, 63, 0x00)
      val bw = new BitWriter(out)
      val cwP = Seq(w, cw, cw)(ci)
      val chP = Seq(h, ch, ch)(ci)
      var n = ((cwP + 7) / 8) * ((chP + 7) / 8)
      while (n > 0) {
        val r = math.min(14, 31 - Integer.numberOfLeadingZeros(n))
        bw.put(acE.codeOf(r << 4), acE.lenOf(r << 4))
        val run = math.min(n, (1 << r) + (1 << r) - 1)
        if (r > 0) bw.put(run - (1 << r), r)
        n -= run
      }
      bw.finish()
    }
    marker(out, 0xd9)
    out.toByteArray
  }

  // ---------------------------------------------------------------
  // Decoder
  // ---------------------------------------------------------------

  /** One decoded component plane at its NATURAL (subsampled)
    * resolution: `id` is the stream's component id, `w`×`h` the
    * cropped plane dims, `hs`/`vs` the sampling factors. */
  final case class Plane(id: Int, w: Int, h: Int, hs: Int, vs: Int,
                         data: Array[Int])

  /** Decoded frame: image dims + per-component planes in SOF order. */
  final case class Decoded(w: Int, h: Int, planes: IndexedSeq[Plane])

  private final case class CompSpec(id: Int, hs: Int, vs: Int, tq: Int)

  /** Decode a baseline (SOF0/SOF1) or PROGRESSIVE (SOF2) JFIF stream
    * to its component planes. Progressive streams accumulate
    * QUANTIZED coefficients across scans — spectral-selection bands,
    * successive-approximation DC/AC first+refinement passes, EOBn
    * run coding — and render once at EOI; baseline is the one-scan
    * special case of the same store. Fail-fast on anything
    * malformed: bad SOI, truncated segments, arithmetic coding,
    * hierarchical/lossless SOFs, unknown quant/huff table
    * references, invalid Huffman codes, coefficient overflow. */
  def decodePlanes(bytes: Array[Byte]): Decoded = {
    require(bytes.length >= 4 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8, "JPEG: missing SOI marker")
    var pos = 2
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffDecoder](4)
    val acTabs = new Array[HuffDecoder](4)
    var comps: IndexedSeq[CompSpec] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var progressive = false
    var dec: CoefDecoder = null

    def need(n: Int): Unit =
      if (pos + n > bytes.length)
        throw new IllegalArgumentException("JPEG: truncated stream")
    def rU8(): Int = { need(1); val v = bytes(pos) & 0xff; pos += 1; v }
    def rU16(): Int = { need(2); (rU8() << 8) | rU8() }

    while (pos < bytes.length) {
      var m = rU8()
      if (m != 0xff)
        throw new IllegalArgumentException(
          f"JPEG: expected marker, got 0x$m%02x")
      m = rU8()
      while (m == 0xff) m = rU8() // fill bytes
      m match {
        case 0xd9 => // EOI — render the accumulated coefficients
          if (dec == null)
            throw new IllegalArgumentException("JPEG: no scan before EOI")
          return dec.render(quant)
        case 0xc0 | 0xc1 | 0xc2 => // baseline / ext. sequential / progressive
          progressive = m == 0xc2
          val len = rU16(); val end = pos + len - 2
          val prec = rU8()
          require(prec == 8, s"JPEG: unsupported precision $prec")
          h = rU16(); w = rU16()
          require(w > 0 && h > 0, "JPEG: zero image dims")
          val nc = rU8()
          require(nc == 1 || nc == 3, s"JPEG: unsupported $nc components")
          comps = (0 until nc).map { _ =>
            val id = rU8(); val hv = rU8(); val tq = rU8()
            val cs = CompSpec(id, (hv >> 4) & 0xf, hv & 0xf, tq)
            require(cs.hs >= 1 && cs.hs <= 2 && cs.vs >= 1 && cs.vs <= 2,
              s"JPEG: unsupported sampling ${cs.hs}x${cs.vs}")
            cs
          }
          pos = end
        case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd |
             0xce | 0xcf =>
          throw new IllegalArgumentException(
            f"JPEG: unsupported SOF marker 0xff$m%02x; " +
              "baseline and progressive only")
        case 0xdb => // DQT
          val len = rU16(); val end = pos + len - 2
          while (pos < end) {
            val pqTq = rU8()
            val pq = (pqTq >> 4) & 0xf; val tq = pqTq & 0xf
            require(pq <= 1 && tq < 4, "JPEG: bad DQT header")
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) {
              t(ZigZag(i)) = if (pq == 0) rU8() else rU16()
              i += 1
            }
            quant(tq) = t
          }
          require(pos == end, "JPEG: DQT length mismatch")
        case 0xc4 => // DHT
          val len = rU16(); val end = pos + len - 2
          while (pos < end) {
            val tcTh = rU8()
            val tc = (tcTh >> 4) & 0xf; val th = tcTh & 0xf
            require(tc <= 1 && th < 4, "JPEG: bad DHT header")
            val bits = Array.fill(16)(rU8())
            val n = bits.sum
            require(n <= 256, "JPEG: bad DHT symbol count")
            need(n)
            val vals = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
            pos += n
            val tab = new HuffDecoder(bits, vals)
            if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
          }
          require(pos == end, "JPEG: DHT length mismatch")
        case 0xdd => // DRI
          val len = rU16(); require(len == 4, "JPEG: bad DRI length")
          restartInterval = rU16()
        case 0xda => // SOS — decode this scan's coefficients
          require(comps != null, "JPEG: SOS before SOF")
          if (dec == null)
            dec = new CoefDecoder(bytes, w, h, comps, progressive)
          val len = rU16(); val end = pos + len - 2
          val ns = rU8()
          require(ns >= 1 && ns <= comps.length, "JPEG: bad scan count")
          val scanComps = (0 until ns).map { _ =>
            val id = rU8(); val t = rU8()
            val c = comps.indexWhere(_.id == id)
            require(c >= 0, "JPEG: scan references unknown component")
            (c, (t >> 4) & 0xf, t & 0xf)
          }
          val ss = rU8(); val se = rU8(); val ahAl = rU8()
          val ah = (ahAl >> 4) & 0xf; val al = ahAl & 0xf
          require(pos == end, "JPEG: SOS length mismatch")
          if (!progressive) {
            require(ss == 0 && se == 63 && ah == 0 && al == 0,
              "JPEG: sequential scan must cover the full band")
          } else {
            require(ss <= 63 && se <= 63 && ss <= se && al <= 13,
              "JPEG: bad progressive band")
            if (ss == 0)
              require(se == 0, "JPEG: progressive DC scan must have Se=0")
            else
              require(ns == 1,
                "JPEG: progressive AC scan must be single-component")
          }
          pos = dec.decodeScan(pos, scanComps, ss, se, ah, al,
            restartInterval, dcTabs, acTabs)
        case x if x >= 0xe0 && x <= 0xef => // APPn
          // NOT `pos += rU16() - 2`: += reads the old pos before the
          // rU16() side effect and would clobber it
          val len = rU16(); pos += len - 2
        case 0xfe => // COM
          val len = rU16(); pos += len - 2
        case 0xc8 =>
          throw new IllegalArgumentException(
            "JPEG: arithmetic coding (JPG marker) not supported")
        case 0xdc => // DNL — ignore (dims come from SOF here)
          val len = rU16(); pos += len - 2
        case other =>
          throw new IllegalArgumentException(
            f"JPEG: unexpected marker 0xff$other%02x")
      }
    }
    if (dec == null)
      throw new IllegalArgumentException("JPEG: no SOS marker found")
    throw new IllegalArgumentException("JPEG: truncated stream (no EOI)")
  }

  /** Cross-scan coefficient decoder: holds every block's QUANTIZED
    * coefficients (natural order per block, padded interleaved grid)
    * while scans arrive, then dequantizes + IDCTs once at EOI.
    * Baseline's single full-band scan and progressive's
    * band/approximation passes share the same store and walkers. */
  private final class CoefDecoder(bytes: Array[Byte], w: Int, h: Int,
      comps: IndexedSeq[CompSpec], progressive: Boolean) {
    private val hmax = comps.map(_.hs).max
    private val vmax = comps.map(_.vs).max
    private val mcuX = (w + 8 * hmax - 1) / (8 * hmax)
    private val mcuY = (h + 8 * vmax - 1) / (8 * vmax)
    private val gridW = comps.map(c => mcuX * c.hs).toArray
    private val gridH = comps.map(c => mcuY * c.vs).toArray
    private val coefs = comps.indices
      .map(ci => new Array[Int](gridW(ci) * gridH(ci) * 64)).toArray

    /** Decode one scan's entropy segment starting at `start`; returns
      * the position of the next marker's 0xFF. */
    def decodeScan(start: Int, scanComps: IndexedSeq[(Int, Int, Int)],
        ss: Int, se: Int, ah: Int, al: Int, restartInterval: Int,
        dcTabs: Array[HuffDecoder],
        acTabs: Array[HuffDecoder]): Int = {
      val br = new BitReader(bytes, start)
      val dcPred = new Array[Int](comps.length)
      var eobrun = 0

      def receive(n: Int): Int = {
        var v = 0; var i = 0
        while (i < n) { v = (v << 1) | br.readBit(); i += 1 }
        v
      }

      // --- per-block decoders over the shared store ---
      def blockFull(ci: Int, off: Int, dc: HuffDecoder,
                    ac: HuffDecoder): Unit = {
        require(dc != null && ac != null,
          "JPEG: scan references undefined Huffman table")
        val s = dc.decode(br)
        require(s <= 11, "JPEG: DC magnitude out of range")
        dcPred(ci) += extend(br, s)
        coefs(ci)(off) = dcPred(ci)
        var k = 1
        var eob = false
        while (k < 64 && !eob) {
          val rs = ac.decode(br)
          val r = (rs >> 4) & 0xf; val sz = rs & 0xf
          if (sz == 0) {
            if (r == 15) k += 16 else eob = true
          } else {
            k += r
            require(k < 64, "JPEG: AC coefficient index overflow")
            coefs(ci)(off + ZigZag(k)) = extend(br, sz)
            k += 1
          }
        }
      }
      def dcFirst(ci: Int, off: Int, dc: HuffDecoder): Unit = {
        require(dc != null,
          "JPEG: scan references undefined Huffman table")
        val s = dc.decode(br)
        require(s <= 11, "JPEG: DC magnitude out of range")
        dcPred(ci) += extend(br, s)
        coefs(ci)(off) = dcPred(ci) << al
      }
      def dcRefine(ci: Int, off: Int): Unit =
        if (br.readBit() == 1) coefs(ci)(off) |= (1 << al)
      def acFirst(ci: Int, off: Int, ac: HuffDecoder): Unit = {
        require(ac != null,
          "JPEG: scan references undefined Huffman table")
        if (eobrun > 0) { eobrun -= 1; return }
        var k = ss
        var done = false
        while (k <= se && !done) {
          val rs = ac.decode(br)
          val r = (rs >> 4) & 0xf; val sz = rs & 0xf
          if (sz == 0) {
            if (r == 15) k += 16
            else {
              // EOBn: this block is the first member of the run
              eobrun = (1 << r) - 1 + (if (r > 0) receive(r) else 0)
              done = true
            }
          } else {
            k += r
            require(k <= se, "JPEG: AC index past band end")
            coefs(ci)(off + ZigZag(k)) = extend(br, sz) << al
            k += 1
          }
        }
      }
      /** AC successive-approximation refinement (T.81 G.1.2.3 /
        * the libjpeg decode_mcu_AC_refine walk): correction bits for
        * already-nonzero coefficients, new coefficients inserted at
        * +-2^Al, EOB runs carrying corrections through the band. */
      def acRefine(ci: Int, off: Int, ac: HuffDecoder): Unit = {
        require(ac != null,
          "JPEG: scan references undefined Huffman table")
        val p1 = 1 << al
        val m1 = -1 << al
        def correct(idx: Int): Unit =
          if (br.readBit() == 1 && (coefs(ci)(idx) & p1) == 0)
            coefs(ci)(idx) += (if (coefs(ci)(idx) >= 0) p1 else m1)
        var k = ss
        if (eobrun == 0) {
          var toEob = false
          while (k <= se && !toEob) {
            val rs = ac.decode(br)
            var r = (rs >> 4) & 0xf; val sz = rs & 0xf
            var ins = 0
            if (sz == 0) {
              if (r != 15) {
                // EOBn: run count includes THIS block (decremented in
                // the EOB phase below after its corrections)
                eobrun = (1 << r) + (if (r > 0) receive(r) else 0)
                toEob = true
              }
              // r == 15: pass 16 zero-history coefficients
            } else {
              require(sz == 1, "JPEG: refinement magnitude must be 1")
              ins = if (br.readBit() == 1) p1 else m1
            }
            if (!toEob) {
              var stopped = false
              while (k <= se && !stopped) {
                val idx = off + ZigZag(k)
                if (coefs(ci)(idx) != 0) correct(idx)
                else {
                  r -= 1
                  if (r < 0) stopped = true
                }
                if (!stopped) k += 1
              }
              if (ins != 0) {
                require(k <= se, "JPEG: refinement insert past band end")
                coefs(ci)(off + ZigZag(k)) = ins
              }
              k += 1
            }
          }
        }
        if (eobrun > 0) {
          while (k <= se) {
            val idx = off + ZigZag(k)
            if (coefs(ci)(idx) != 0) correct(idx)
            k += 1
          }
          eobrun -= 1
        }
      }

      def restartIfDue(mcu: Int): Unit =
        if (restartInterval > 0 && mcu > 0 &&
          mcu % restartInterval == 0) {
          br.align()
          def nextByte(): Int = {
            if (br.pos >= bytes.length)
              throw new IllegalArgumentException("JPEG: truncated scan data")
            val b = bytes(br.pos) & 0xff; br.pos += 1; b
          }
          var b = nextByte()
          while (b != 0xff) b = nextByte()
          val m = nextByte()
          require(m >= 0xd0 && m <= 0xd7,
            f"JPEG: expected restart marker, got 0xff$m%02x")
          java.util.Arrays.fill(dcPred, 0)
          eobrun = 0
        }

      if (scanComps.length > 1) {
        // interleaved walk: full-band (sequential) or DC (progressive)
        var mcu = 0
        var my = 0
        while (my < mcuY) {
          var mx = 0
          while (mx < mcuX) {
            restartIfDue(mcu)
            scanComps.foreach { case (ci, dcT, acT) =>
              val c = comps(ci)
              var by = 0
              while (by < c.vs) {
                var bx = 0
                while (bx < c.hs) {
                  val off = ((my * c.vs + by) * gridW(ci) +
                    (mx * c.hs + bx)) * 64
                  if (!progressive)
                    blockFull(ci, off, dcTabs(dcT), acTabs(acT))
                  else if (ah == 0) dcFirst(ci, off, dcTabs(dcT))
                  else dcRefine(ci, off)
                  bx += 1
                }
                by += 1
              }
            }
            mcu += 1
            mx += 1
          }
          my += 1
        }
      } else {
        // non-interleaved walk: the component's OWN block grid
        // (ceil of its natural dims — NOT the MCU-padded grid)
        val (ci, dcT, acT) = scanComps(0)
        val c = comps(ci)
        val cw = (w * c.hs + hmax - 1) / hmax
        val chh = (h * c.vs + vmax - 1) / vmax
        val bw = (cw + 7) / 8
        val bh = (chh + 7) / 8
        var mcu = 0
        var byy = 0
        while (byy < bh) {
          var bxx = 0
          while (bxx < bw) {
            restartIfDue(mcu)
            val off = (byy * gridW(ci) + bxx) * 64
            if (!progressive) blockFull(ci, off, dcTabs(dcT), acTabs(acT))
            else if (ss == 0) {
              if (ah == 0) dcFirst(ci, off, dcTabs(dcT))
              else dcRefine(ci, off)
            } else {
              if (ah == 0) acFirst(ci, off, acTabs(acT))
              else acRefine(ci, off, acTabs(acT))
            }
            mcu += 1
            bxx += 1
          }
          byy += 1
        }
      }

      // skip to the next marker (stuffed bytes and stray RSTn pass)
      var p = br.pos
      while (p < bytes.length) {
        if ((bytes(p) & 0xff) != 0xff) p += 1
        else if (p + 1 >= bytes.length)
          throw new IllegalArgumentException("JPEG: truncated stream")
        else {
          val nxt = bytes(p + 1) & 0xff
          if (nxt == 0x00 || (nxt >= 0xd0 && nxt <= 0xd7)) p += 2
          else return p
        }
      }
      throw new IllegalArgumentException("JPEG: truncated stream")
    }

    /** Dequantize + IDCT every block and crop to natural component
      * dims. */
    def render(quant: Array[Array[Int]]): Decoded = {
      val planes = comps.indices.map { ci =>
        val c = comps(ci)
        val q = quant(c.tq)
        require(q != null, "JPEG: undefined quantization table")
        val bw = gridW(ci)
        val planeW = bw * 8
        val store = new Array[Int](planeW * gridH(ci) * 8)
        var b = 0
        while (b < bw * gridH(ci)) {
          val off = b * 64
          val cf = new Array[Double](64)
          var i = 0
          while (i < 64) {
            cf(i) = coefs(ci)(off + i).toDouble * q(i)
            i += 1
          }
          val px = idct(cf)
          val x0 = (b % bw) * 8; val y0 = (b / bw) * 8
          var j = 0
          while (j < 64) {
            val v = math.round(px(j) + 128.0).toInt
            store((y0 + j / 8) * planeW + (x0 + j % 8)) =
              math.max(0, math.min(255, v))
            j += 1
          }
          b += 1
        }
        val cw = (w * c.hs + hmax - 1) / hmax
        val chh = (h * c.vs + vmax - 1) / vmax
        val data = new Array[Int](cw * chh)
        var y = 0
        while (y < chh) {
          var x = 0
          while (x < cw) {
            data(y * cw + x) = store(y * planeW + x)
            x += 1
          }
          y += 1
        }
        Plane(c.id, cw, chh, c.hs, c.vs, data)
      }
      Decoded(w, h, planes)
    }
  }

  /** Decode to packed 0xRRGGBB pixels: replication chroma upsample +
    * JFIF BT.601 full-range conversion (grayscale replicates luma). */
  def decodeRgb24(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val d = decodePlanes(bytes)
    val out = new Array[Int](d.w * d.h)
    if (d.planes.length == 1) {
      val p = d.planes.head
      var i = 0
      while (i < out.length) {
        val v = p.data(i / d.w * p.w + i % d.w)
        out(i) = (v << 16) | (v << 8) | v
        i += 1
      }
    } else {
      val py = d.planes(0); val pcb = d.planes(1); val pcr = d.planes(2)
      val hmax = d.planes.map(_.hs).max
      val vmax = d.planes.map(_.vs).max
      var y = 0
      while (y < d.h) {
        var x = 0
        while (x < d.w) {
          val yy = py.data(
            (y * py.vs / vmax) * py.w + (x * py.hs / hmax))
          val cb = pcb.data(
            (y * pcb.vs / vmax) * pcb.w + (x * pcb.hs / hmax)) - 128
          val cr = pcr.data(
            (y * pcr.vs / vmax) * pcr.w + (x * pcr.hs / hmax)) - 128
          def cl(v: Double): Int =
            math.max(0, math.min(255, math.round(v).toInt))
          val r = cl(yy + 1.402 * cr)
          val g = cl(yy - 0.344136 * cb - 0.714136 * cr)
          val b = cl(yy + 1.772 * cb)
          out(y * d.w + x) = (r << 16) | (g << 8) | b
          x += 1
        }
        y += 1
      }
    }
    (d.w, d.h, out)
  }
}
