package graft.ext

/** From-scratch H.264/AVC I-frame codec (ITU-T H.264 / ISO 14496-10,
  * Annex B byte streams) — the INTERFRAME-VIDEO-container member of
  * the codec family (VERDICT r13 #7), built with the same from-spec
  * discipline as [[JpegCodec]]: no libraries, every layer real.
  *
  * What is fully implemented (spec section references):
  *  - Annex B framing: start codes, NAL headers, and emulation-
  *    prevention bytes (7.4.1: `00 00 0x` → `00 00 03 0x`) in both
  *    directions — I_PCM payloads carry arbitrary bytes, so the gate
  *    content actually exercises escaping;
  *  - Exp-Golomb ue(v)/se(v) coding (9.1) and the RBSP bit reader /
  *    writer with rbsp_trailing_bits;
  *  - SPS/PPS (7.3.2.1/7.3.2.2): baseline profile 66,
  *    pic_order_cnt_type 2, CAVLC entropy mode, deblocking control
  *    present; the parser walks every field it skips;
  *  - IDR slice header (7.3.3) with deblocking DISABLED
  *    (disable_deblocking_filter_idc = 1), so reconstruction is
  *    bit-exact prediction — no filter to approximate;
  *  - Macroblock layer (7.3.5): **I_PCM** (mb_type 25 — alignment +
  *    raw 4:2:0 samples, the spec's lossless escape) and **I_16x16
  *    DC-predicted** MBs (mb_type 3: predMode DC, cbp 0) with the
  *    always-present Intra16x16DCLevel parsed through real CAVLC
  *    coeff_token decoding (9.2.1) including nC derivation from
  *    neighbor total-coefficient counts (I_PCM neighbors count 16,
  *    cbp-0 I_16x16 neighbors 0) and the nC≥8 fixed-length table;
  *  - Intra 16x16 DC luma prediction (8.3.3.1: (Σtop + Σleft + 16)>>5
  *    both neighbors, (Σ+8)>>4 one, 128 none) and DC chroma
  *    prediction, with raster-scan availability rules.
  *
  * Extended beyond the r14 close with two more macroblock layers:
  *  - **CAVLC DC residuals** (9.2 + 8.5.10/8.5.12): I_16x16 MBs whose
  *    Intra16x16DCLevel carries ONE nonzero coefficient — real
  *    coeff_token VLC (the 0≤nC<2 column of Table 9-5 through
  *    TotalCoeff 5, plus the nC≥8 fixed-length class), trailing-one
  *    sign bits, the full level_prefix/level_suffix algorithm
  *    including the 4-bit prefix-14 and 12-bit prefix-15 escapes,
  *    the TotalCoeff-1 total_zeros row, the 4x4 zigzag, the inverse
  *    Hadamard DC transform, and dequantization at the stream's
  *    fixed QP 26 (LevelScale 13: dcY = (f·13 + 2) >> 2, then
  *    r = (dcY + 32) >> 6 per 4x4 block with all-zero AC) — exact
  *    integer arithmetic end to end;
  *  - **I_4x4 prediction** (mb_type 0, 8.3.1): per-4x4-block
  *    Vertical / Horizontal / DC modes with the spec's most-probable-
  *    mode coding (prev_intra4x4_pred_mode_flag + 3-bit remainder,
  *    predMode = min(left, top), either-unavailable → DC, non-I4x4
  *    neighbors count as DC), cbp 0 via the Table 9-4 intra me(v)
  *    mapping, block-by-block reconstruction in luma4x4BlkIdx order
  *    so within-MB blocks predict from already-reconstructed pixels.
  *
  * And with INTERFRAME coding (the last named multimodal seam):
  *  - **P slices** (7.3.3/7.4.3 + 8.4): mb_skip_run coding, P_SKIP
  *    with the 8.4.1.1 zero-motion conditions, P_L0_16x16 with
  *    mvd_l0 coded against the 8.4.1.3 median predictor (A/B/C with
  *    the D fallback, the B∧C-unavailable→mvA rule, and the
  *    exactly-one-matching-refIdx rule), cbp 0 (residual-free inter);
  *  - **motion compensation at FULL sub-pel resolution** (8.4.2.2):
  *    quarter-pel luma via the 6-tap (1,−5,20,20,−5,1) half-pel
  *    filter (+16>>5), the center position j from unrounded
  *    intermediates (+512>>10), quarter positions as +1>>1 neighbor
  *    averages, and eighth-pel chroma via the spec bilinear — every
  *    stage exact integer arithmetic over the edge-replicated
  *    reference, so interframe reconstruction stays inside the
  *    hash-exact oracle contract.
  *
  * Scope contract (fail-fast, never guess): DC residual blocks with
  * TotalCoeff > 1, coeff_token codes outside the implemented table
  * rows, the 2≤nC<8 VLC columns, diagonal I_4x4 modes (3..8),
  * nonzero coded_block_pattern, nonzero qp deltas (the QP-26
  * contract), CABAC, B slices, multi-reference lists, or non-16x16
  * inter partitions are REJECTED by name — the decoder decodes
  * exactly the subset its paired encoder emits (the `JpegCodec`
  * progressive-gate-writer precedent). Within that subset the
  * bitstreams are fully conformant H.264 any reference decoder would
  * reconstruct identically.
  */
object H264Codec {

  // ------------------------------------------------------------ bits
  private final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var acc = 0
    private var nBits = 0
    def u(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { putBit((v >> i) & 1); i -= 1 }
    }
    def putBit(b: Int): Unit = {
      acc = (acc << 1) | (b & 1); nBits += 1
      if (nBits == 8) { buf += acc.toByte; acc = 0; nBits = 0 }
    }
    /** ue(v), 9.1: leadingZeroBits zeros, 1, then info bits. */
    def ue(v: Int): Unit = {
      val codeNum = v + 1
      val bits = 32 - Integer.numberOfLeadingZeros(codeNum)
      u(0, bits - 1)
      u(codeNum, bits)
    }
    /** se(v), 9.1.1: k>0 → 2k−1, k<0 → −2k, 0 → 0. */
    def se(v: Int): Unit = ue(if (v <= 0) -2 * v else 2 * v - 1)
    def byteAligned: Boolean = nBits == 0
    def alignZero(): Unit = while (nBits != 0) putBit(0)
    def putByte(b: Int): Unit = {
      require(byteAligned, "raw byte write requires alignment")
      buf += b.toByte
    }
    def rbspTrailing(): Unit = { putBit(1); alignZero() }
    def toBytes: Array[Byte] = {
      require(byteAligned, "unflushed bits"); buf.toArray
    }
  }

  private final class BitReader(data: Array[Byte]) {
    var pos = 0
    private var acc = 0
    private var nBits = 0
    def readBit(): Int = {
      if (nBits == 0) {
        require(pos < data.length, "H264: truncated RBSP")
        acc = data(pos) & 0xff; pos += 1; nBits = 8
      }
      nBits -= 1
      (acc >> nBits) & 1
    }
    def u(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def ue(): Int = {
      var zeros = 0
      while (readBit() == 0) {
        zeros += 1
        require(zeros < 32, "H264: Exp-Golomb run too long")
      }
      (1 << zeros) - 1 + u(zeros)
    }
    def se(): Int = {
      val k = ue()
      if (k % 2 == 1) (k + 1) / 2 else -(k / 2)
    }
    def byteAligned: Boolean = nBits == 0
    def align(): Unit = nBits = 0
    def readByteAligned(): Int = {
      require(byteAligned, "raw byte read requires alignment")
      require(pos < data.length, "H264: truncated RBSP")
      val b = data(pos) & 0xff; pos += 1; b
    }
  }

  // ----------------------------------------------------- NAL framing
  /** RBSP → NAL payload: insert emulation-prevention 0x03 before any
    * byte ≤ 3 that follows two zero bytes (7.4.1). */
  private def escapeRbsp(rbsp: Array[Byte]): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var zeros = 0
    for (b <- rbsp) {
      if (zeros >= 2 && (b & 0xff) <= 3) { out += 3.toByte; zeros = 0 }
      out += b
      zeros = if (b == 0) zeros + 1 else 0
    }
    out.toArray
  }

  /** NAL payload → RBSP: drop each 0x03 that follows two zero bytes. */
  private def unescapeRbsp(nal: Array[Byte]): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var zeros = 0
    var i = 0
    while (i < nal.length) {
      val b = nal(i)
      if (zeros >= 2 && (b & 0xff) == 3) {
        require(i + 1 >= nal.length || (nal(i + 1) & 0xff) <= 3,
          "H264: invalid emulation-prevention byte")
        zeros = 0 // drop the 03
      } else {
        out += b
        zeros = if (b == 0) zeros + 1 else 0
      }
      i += 1
    }
    out.toArray
  }

  private def nal(refIdc: Int, nalType: Int,
                  rbsp: Array[Byte]): Array[Byte] =
    Array[Byte](0, 0, 0, 1, ((refIdc << 5) | nalType).toByte) ++
      escapeRbsp(rbsp)

  // ---------------------------------------------------------- encode
  /** Per-MB content: either raw I_PCM samples or a DC-predicted MB
    * (no residual — reconstruction is the spec prediction). */
  sealed trait Mb
  /** lumaY: 256 samples (raster 16×16); chroma planes constant. */
  final case class PcmMb(lumaY: Array[Int], cb: Int = 128,
                         cr: Int = 128) extends Mb
  case object DcPredMb extends Mb
  /** DC-predicted I_16x16 whose Intra16x16DCLevel carries ONE
    * nonzero coefficient `level` at zigzag position `zigzagPos` —
    * with all-zero AC the reconstruction adds a per-4x4-block
    * quantized offset to the DC prediction (uniform across the MB
    * when zigzagPos = 0). */
  final case class DcResidualMb(level: Int,
                                zigzagPos: Int = 0) extends Mb
  /** I_NxN (mb_type 0) with cbp 0: 16 per-block intra modes in
    * luma4x4BlkIdx order — 0 Vertical, 1 Horizontal, 2 DC. */
  final case class I4x4Mb(modes: Array[Int]) extends Mb
  object I4x4Mb {
    def uniform(mode: Int): I4x4Mb = I4x4Mb(Array.fill(16)(mode))
  }

  /** P-slice macroblock content: P_SKIP (derived motion, exact
    * reference copy) or P_L0_16x16 with an explicit quarter-pel
    * motion vector at ANY fractional position — the 6-tap half-pel
    * filter, quarter-pel averaging, and eighth-pel chroma bilinear
    * are all exact integer arithmetic. */
  sealed trait PMb
  case object PSkip extends PMb
  final case class PMvMb(mvxQ: Int, mvyQ: Int) extends PMb

  /** B-slice macroblock content: single-list or BI-predicted 16x16
    * partitions. With one reference picture in the DPB both default
    * lists are [that picture], and bi-prediction is the spec's
    * default average (predL0 + predL1 + 1) >> 1 — exact integers. */
  sealed trait BMb
  final case class BL0Mb(mvxQ: Int, mvyQ: Int) extends BMb
  final case class BL1Mb(mvxQ: Int, mvyQ: Int) extends BMb
  final case class BBiMb(l0x: Int, l0y: Int, l1x: Int,
                         l1y: Int) extends BMb

  /** Encode one IDR frame of `mbw`×`mbh` macroblocks as a complete
    * Annex B stream (SPS + PPS + IDR slice). */
  def encode(mbw: Int, mbh: Int, mbs: Seq[Mb]): Array[Byte] =
    encodeIP(mbw, mbh, mbs, Seq.empty)

  /** Encode an IDR frame followed by one NON-REFERENCE B frame
    * (nal_ref_idc 0, so no dec_ref_pic_marking): every MB coded as
    * B_L0_16x16 / B_L1_16x16 / B_Bi_16x16 with per-list
    * median-predicted mvd coding, cbp 0. */
  def encodeIB(mbw: Int, mbh: Int, mbs: Seq[Mb],
               bMbs: Seq[BMb]): Array[Byte] = {
    require(bMbs.length == mbw * mbh,
      "B frame needs one BMb per macroblock")
    val head = encodeIP(mbw, mbh, mbs, Seq.empty)
    head ++ nal(0, 1, buildBSlice(mbw, mbh, bMbs))
  }

  private def buildBSlice(mbw: Int, mbh: Int,
                          bMbs: Seq[BMb]): Array[Byte] = {
    val sl = new BitWriter
    sl.ue(0) // first_mb_in_slice
    sl.ue(6) // slice_type: B (all slices of picture)
    sl.ue(0) // pic_parameter_set_id
    sl.u(1, 4) // frame_num
    sl.putBit(0) // direct_spatial_mv_pred_flag
    sl.putBit(0) // num_ref_idx_active_override_flag
    sl.putBit(0) // ref_pic_list_modification_flag_l0
    sl.putBit(0) // ref_pic_list_modification_flag_l1
    // nal_ref_idc = 0 → NO dec_ref_pic_marking
    sl.se(0) // slice_qp_delta
    sl.ue(1) // disable_deblocking_filter_idc
    val mv0 = Array.fill(mbw * mbh)((0, 0, -1))
    val mv1 = Array.fill(mbw * mbh)((0, 0, -1))
    for (my <- 0 until mbh; mx <- 0 until mbw) {
      val i = my * mbw + mx
      sl.ue(0) // mb_skip_run: every MB coded
      bMbs(i) match {
        case BL0Mb(vx, vy) =>
          sl.ue(1) // B_L0_16x16
          val (px, py) = mvPred16(mv0, mbw, mx, my)
          sl.se(vx - px); sl.se(vy - py)
          sl.ue(0) // cbp 0 (inter me(v): codeNum 0 → 0)
          mv0(i) = (vx, vy, 0)
        case BL1Mb(vx, vy) =>
          sl.ue(2) // B_L1_16x16
          val (px, py) = mvPred16(mv1, mbw, mx, my)
          sl.se(vx - px); sl.se(vy - py)
          sl.ue(0)
          mv1(i) = (vx, vy, 0)
        case BBiMb(v0x, v0y, v1x, v1y) =>
          sl.ue(3) // B_Bi_16x16
          val (p0x, p0y) = mvPred16(mv0, mbw, mx, my)
          val (p1x, p1y) = mvPred16(mv1, mbw, mx, my)
          sl.se(v0x - p0x); sl.se(v0y - p0y)
          sl.se(v1x - p1x); sl.se(v1y - p1y)
          sl.ue(0)
          mv0(i) = (v0x, v0y, 0)
          mv1(i) = (v1x, v1y, 0)
      }
    }
    sl.rbspTrailing()
    sl.toBytes
  }

  /** Encode an IDR frame followed (when `pMbs` is non-empty) by one
    * motion-compensated P frame: mb_skip_run coding, P_L0_16x16
    * motion-vector-difference coding against the spec's median
    * predictor, cbp 0 (residual-free inter MBs). */
  def encodeIP(mbw: Int, mbh: Int, mbs: Seq[Mb],
               pMbs: Seq[PMb]): Array[Byte] = {
    require(mbs.length == mbw * mbh,
      s"need ${mbw * mbh} MBs, got ${mbs.length}")
    require(pMbs.isEmpty || pMbs.length == mbw * mbh,
      "P frame needs one PMb per macroblock")
    // SPS (7.3.2.1)
    val sps = new BitWriter
    sps.u(66, 8) // profile_idc: baseline
    sps.u(0, 8) // constraint flags + reserved
    sps.u(10, 8) // level_idc
    sps.ue(0) // seq_parameter_set_id
    sps.ue(0) // log2_max_frame_num_minus4 → 4 bits
    sps.ue(2) // pic_order_cnt_type 2: no further POC syntax
    sps.ue(1) // max_num_ref_frames (the P frame references the IDR)
    sps.putBit(0) // gaps_in_frame_num_value_allowed_flag
    sps.ue(mbw - 1) // pic_width_in_mbs_minus1
    sps.ue(mbh - 1) // pic_height_in_map_units_minus1
    sps.putBit(1) // frame_mbs_only_flag
    sps.putBit(0) // direct_8x8_inference_flag
    sps.putBit(0) // frame_cropping_flag
    sps.putBit(0) // vui_parameters_present_flag
    sps.rbspTrailing()
    // PPS (7.3.2.2)
    val pps = new BitWriter
    pps.ue(0); pps.ue(0) // pps id, sps id
    pps.putBit(0) // entropy_coding_mode_flag: CAVLC
    pps.putBit(0) // bottom_field_pic_order_in_frame_present_flag
    pps.ue(0) // num_slice_groups_minus1
    pps.ue(0); pps.ue(0) // num_ref_idx_l{0,1}_default_active_minus1
    pps.putBit(0) // weighted_pred_flag
    pps.u(0, 2) // weighted_bipred_idc
    pps.se(0); pps.se(0) // pic_init_qp/qs_minus26
    pps.se(0) // chroma_qp_index_offset
    pps.putBit(1) // deblocking_filter_control_present_flag
    pps.putBit(0) // constrained_intra_pred_flag
    pps.putBit(0) // redundant_pic_cnt_present_flag
    pps.rbspTrailing()
    // IDR slice (7.3.3 + 7.3.5)
    val sl = new BitWriter
    sl.ue(0) // first_mb_in_slice
    sl.ue(7) // slice_type: I (all slices of picture)
    sl.ue(0) // pic_parameter_set_id
    sl.u(0, 4) // frame_num (log2_max_frame_num = 4)
    sl.ue(0) // idr_pic_id
    sl.putBit(0); sl.putBit(0) // dec_ref_pic_marking (IDR): no_output, long_term
    sl.se(0) // slice_qp_delta
    sl.ue(1) // disable_deblocking_filter_idc: FILTER OFF
    // per-MB total-coefficient map for CAVLC nC (I_PCM counts 16;
    // an I_16x16 MB's 4x4 blocks count their Intra16x16ACLevel
    // coefficients — always 0 here since cbpLuma = 0; the DC block
    // does NOT contribute, per the 9.2.1 neighbor rule), plus the
    // per-4x4-block intra-mode grid for I_NxN most-probable-mode
    // coding (non-I4x4 MBs count as DC = 2)
    val tc = Array.fill(mbw * mbh)(0)
    val modeGrid = Array.fill(mbw * 4 * mbh * 4)(2)
    for (my <- 0 until mbh; mx <- 0 until mbw) {
      val i = my * mbw + mx
      mbs(i) match {
        case PcmMb(y, cb, cr) =>
          require(y.length == 256, "I_PCM luma must be 256 samples")
          sl.ue(25) // mb_type I_PCM
          sl.alignZero() // pcm_alignment_zero_bit
          y.foreach(v => sl.putByte(v))
          for (_ <- 0 until 64) sl.putByte(cb)
          for (_ <- 0 until 64) sl.putByte(cr)
          tc(i) = 16
        case DcPredMb =>
          sl.ue(3) // I_16x16: predMode DC, cbpChroma 0, cbpLuma 0
          sl.ue(0) // intra_chroma_pred_mode: DC
          sl.se(0) // mb_qp_delta
          writeCavlcDcBlock(sl, 0, 0, dcNc(tc, mbw, mx, my))
          tc(i) = 0
        case DcResidualMb(level, pos) =>
          require(pos >= 0 && pos < 16, "zigzag position 0..15")
          sl.ue(3) // same I_16x16 type — the DC block is always coded
          sl.ue(0) // intra_chroma_pred_mode: DC
          sl.se(0) // mb_qp_delta (QP-26 contract)
          writeCavlcDcBlock(sl, level, pos, dcNc(tc, mbw, mx, my))
          tc(i) = 0
        case I4x4Mb(modes) =>
          require(modes.length == 16, "I_4x4 needs 16 block modes")
          sl.ue(0) // mb_type I_NxN
          for (b <- 0 until 16) {
            val (bx, by) = blk4x4Pos(b)
            val gx = mx * 4 + bx / 4
            val gy = my * 4 + by / 4
            val pred = predMode4x4(modeGrid, mbw * 4, gx, gy)
            val m = modes(b)
            require(m >= 0 && m <= 2, "modes 0 (V) / 1 (H) / 2 (DC)")
            if (m == pred) sl.putBit(1)
            else { sl.putBit(0); sl.u(if (m < pred) m else m - 1, 3) }
            modeGrid(gy * mbw * 4 + gx) = m
          }
          sl.ue(0) // intra_chroma_pred_mode: DC
          sl.ue(3) // coded_block_pattern: codeNum 3 → cbp 0 (Table 9-4)
          tc(i) = 0
      }
    }
    sl.rbspTrailing()
    val head = nal(3, 7, sps.toBytes) ++ nal(3, 8, pps.toBytes) ++
      nal(3, 5, sl.toBytes)
    if (pMbs.isEmpty) head
    else head ++ nal(2, 1, buildPSlice(mbw, mbh, pMbs))
  }

  /** One P slice (frame_num 1) over the whole picture. */
  private def buildPSlice(mbw: Int, mbh: Int,
                          pMbs: Seq[PMb]): Array[Byte] = {
    val sl = new BitWriter
    sl.ue(0) // first_mb_in_slice
    sl.ue(5) // slice_type: P (all slices of picture)
    sl.ue(0) // pic_parameter_set_id
    sl.u(1, 4) // frame_num = 1
    sl.putBit(0) // num_ref_idx_active_override_flag
    sl.putBit(0) // ref_pic_list_modification_flag_l0
    sl.putBit(0) // adaptive_ref_pic_marking_mode_flag (nal_ref_idc>0)
    sl.se(0) // slice_qp_delta (QP-26 contract)
    sl.ue(1) // disable_deblocking_filter_idc
    // (mvx, mvy, refIdx); refIdx −1 = unavailable/none yet
    val mvs = Array.fill(mbw * mbh)((0, 0, -1))
    var run = 0
    for (my <- 0 until mbh; mx <- 0 until mbw) {
      val i = my * mbw + mx
      pMbs(i) match {
        case PSkip =>
          run += 1
          val (sx, sy) = skipMv(mvs, mbw, mx, my)
          mvs(i) = (sx, sy, 0)
        case PMvMb(vx, vy) =>
          sl.ue(run); run = 0
          sl.ue(0) // mb_type P_L0_16x16
          // ref_idx_l0 absent: one active reference
          val (px, py) = mvPred16(mvs, mbw, mx, my)
          sl.se(vx - px) // mvd_l0 x
          sl.se(vy - py) // mvd_l0 y
          sl.ue(0) // coded_block_pattern: inter codeNum 0 → cbp 0
          mvs(i) = (vx, vy, 0)
      }
    }
    if (run > 0) sl.ue(run)
    sl.rbspTrailing()
    sl.toBytes
  }

  /** Median motion-vector predictor for a 16x16 partition (8.4.1.3):
    * neighbors A (left), B (top), C (top-right, D top-left fallback);
    * unavailable → (0,0, refIdx −1); B,C both unavailable with A
    * available → mvA; exactly one neighbor sharing refIdx 0 → that
    * mv; else the componentwise median. */
  private def mvPred16(mvs: Array[(Int, Int, Int)], mbw: Int,
                       mx: Int, my: Int): (Int, Int) = {
    val un = (0, 0, -1)
    val a = if (mx > 0) mvs(my * mbw + mx - 1) else un
    val b = if (my > 0) mvs((my - 1) * mbw + mx) else un
    val cAvail = my > 0 && mx + 1 < mbw
    val dAvail = my > 0 && mx > 0
    val c =
      if (cAvail) mvs((my - 1) * mbw + mx + 1)
      else if (dAvail) mvs((my - 1) * mbw + mx - 1)
      else un
    val bUnavail = my == 0
    val cUnavail = !cAvail && !dAvail
    if (bUnavail && cUnavail && mx > 0) (a._1, a._2)
    else {
      val same = Seq(a, b, c).filter(_._3 == 0)
      if (same.length == 1) (same.head._1, same.head._2)
      else {
        def med(x: Int, y: Int, z: Int): Int =
          math.max(math.min(x, y), math.min(math.max(x, y), z))
        (med(a._1, b._1, c._1), med(a._2, b._2, c._2))
      }
    }
  }

  /** P_Skip motion derivation (8.4.1.1): the 16x16 predictor, forced
    * to zero when A or B is unavailable or is a zero-motion
    * reference-0 block. */
  private def skipMv(mvs: Array[(Int, Int, Int)], mbw: Int,
                     mx: Int, my: Int): (Int, Int) = {
    val aAvail = mx > 0
    val bAvail = my > 0
    lazy val a = mvs(my * mbw + mx - 1)
    lazy val b = mvs((my - 1) * mbw + mx)
    if (!aAvail || !bAvail ||
      (a._3 == 0 && a._1 == 0 && a._2 == 0) ||
      (b._3 == 0 && b._1 == 0 && b._2 == 0)) (0, 0)
    else mvPred16(mvs, mbw, mx, my)
  }

  /** nC for the Intra16x16 DC block (9.2.1): mean of the neighboring
    * 4×4 blocks' total coefficients — here MB-uniform (I_PCM ⇒ 16,
    * cbp-0 I_16x16 ⇒ 0), rounded up, single neighbor passes through,
    * none ⇒ 0. */
  private def dcNc(tc: Array[Int], mbw: Int, mx: Int, my: Int): Int = {
    val a = if (mx > 0) Some(tc(my * mbw + mx - 1)) else None
    val b = if (my > 0) Some(tc((my - 1) * mbw + mx)) else None
    (a, b) match {
      case (Some(x), Some(y)) => (x + y + 1) >> 1
      case (Some(x), None) => x
      case (None, Some(y)) => y
      case (None, None) => 0
    }
  }

  // --------------------------------------------------- CAVLC residual
  /** 4x4 zigzag scan (Table 8-13), index → (row, col). */
  private val Zigzag4x4: Array[(Int, Int)] = Array(
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (3, 1), (2, 2), (1, 3), (2, 3), (3, 2), (3, 3))

  /** coeff_token, the 0 ≤ nC < 2 column of Table 9-5 through
    * TotalCoeff 5 — the implemented VLC subset (richer rows and the
    * 2≤nC<8 columns are rejected by name). Entries are
    * (totalCoeff, trailingOnes, codeLength, codeValue). */
  private val CoeffTokenNc0: Array[(Int, Int, Int, Int)] = Array(
    (0, 0, 1, 0x1), (1, 1, 2, 0x1), (2, 2, 3, 0x1), (3, 3, 5, 0x3),
    (1, 0, 6, 0x5), (2, 1, 6, 0x4), (4, 3, 6, 0x3),
    (3, 2, 7, 0x5), (5, 3, 7, 0x4),
    (2, 0, 8, 0x7), (3, 1, 8, 0x6), (4, 2, 8, 0x5),
    (3, 0, 9, 0x7), (4, 1, 9, 0x6), (5, 2, 9, 0x5),
    (4, 0, 10, 0x7), (5, 1, 10, 0x6), (5, 0, 11, 0x7))

  /** total_zeros for TotalCoeff = 1 (Table 9-7 row 1): the only row
    * a single-coefficient DC block can need. tz → (length, code). */
  private val TotalZeros1: Array[(Int, Int)] = Array(
    (1, 1), (3, 3), (3, 2), (4, 3), (4, 2), (5, 3), (5, 2), (6, 3),
    (6, 2), (7, 3), (7, 2), (8, 3), (8, 2), (9, 3), (9, 2), (9, 1))

  private def writeCoeffToken(w: BitWriter, nC: Int, tcf: Int,
                              t1: Int): Unit =
    if (nC >= 8) w.u(if (tcf == 0) 3 else ((tcf - 1) << 2) | t1, 6)
    else if (nC < 2) {
      val e = CoeffTokenNc0.find(x => x._1 == tcf && x._2 == t1)
      require(e.isDefined,
        s"H264: coeff_token ($tcf,$t1) outside implemented subset")
      w.u(e.get._4, e.get._3)
    } else throw new IllegalArgumentException(
      s"H264: coeff_token VLC column for nC=$nC not implemented " +
        "(0≤nC<2 and nC≥8 only)")

  /** level_prefix/level_suffix (9.2.2) at suffixLength 0 — the form a
    * first coded level takes; handles the prefix-14 4-bit and
    * prefix-15 12-bit escapes. `first`+`trailingOnes<3` applies the
    * spec's +2 levelCode bias (inverted here). */
  private def writeLevel(w: BitWriter, level: Int,
                         trailingOnes: Int): Unit = {
    require(level != 0, "coded levels are nonzero")
    var levelCode = if (level > 0) 2 * level - 2 else -2 * level - 1
    if (trailingOnes < 3) levelCode -= 2
    require(levelCode >= 0, "|level| = 1 must be coded as a trailing one")
    if (levelCode < 14) { w.u(0, levelCode); w.putBit(1) }
    else if (levelCode < 30) {
      w.u(0, 14); w.putBit(1); w.u(levelCode - 14, 4)
    } else {
      require(levelCode - 30 < 4096,
        "H264: level beyond the 12-bit suffix escape")
      w.u(0, 15); w.putBit(1); w.u(levelCode - 30, 12)
    }
  }

  /** Inverse of [[writeLevel]] — the general 9.2.2.2 algorithm at
    * suffixLength 0 (single-coefficient blocks never adapt). */
  private def readLevel(r: BitReader, trailingOnes: Int): Int = {
    var prefix = 0
    while (r.readBit() == 0) {
      prefix += 1
      require(prefix <= 15,
        "H264: level_prefix beyond the implemented escape range")
    }
    val suffixSize =
      if (prefix >= 15) prefix - 3
      else if (prefix == 14) 4
      else 0
    var levelCode = math.min(15, prefix)
    if (suffixSize > 0) levelCode += r.u(suffixSize)
    if (prefix >= 15) levelCode += 15
    if (trailingOnes < 3) levelCode += 2
    if (levelCode % 2 == 0) (levelCode + 2) >> 1
    else -((levelCode + 1) >> 1)
  }

  /** The Intra16x16DCLevel block for a single coefficient `level` at
    * zigzag position `pos` (or the all-zero block when level = 0):
    * coeff_token, trailing-one sign or coded level, and the
    * TotalCoeff-1 total_zeros row (tz = the coefficient's zigzag
    * index; run_before never occurs with one coefficient). */
  private def writeCavlcDcBlock(w: BitWriter, level: Int, pos: Int,
                                nC: Int): Unit =
    if (level == 0) writeCoeffToken(w, nC, 0, 0)
    else {
      val t1 = if (level == 1 || level == -1) 1 else 0
      writeCoeffToken(w, nC, 1, t1)
      if (t1 == 1) w.putBit(if (level < 0) 1 else 0)
      else writeLevel(w, level, trailingOnes = 0)
      val (len, code) = TotalZeros1(pos)
      w.u(code, len)
    }

  /** Spec hook: the raw zero-padded bits of one CAVLC DC block, so
    * tests can pin the field layout against hand-derived strings. */
  private[graft] def cavlcDcBlockBits(level: Int, pos: Int,
                                      nC: Int): Array[Byte] = {
    val w = new BitWriter
    writeCavlcDcBlock(w, level, pos, nC)
    w.alignZero()
    w.toBytes
  }

  private def readCoeffTokenNc0(r: BitReader): (Int, Int) = {
    var code = 0
    var len = 0
    while (len < 11) {
      code = (code << 1) | r.readBit()
      len += 1
      val hit = CoeffTokenNc0.find(e => e._3 == len && e._4 == code)
      if (hit.isDefined) return (hit.get._1, hit.get._2)
    }
    throw new IllegalArgumentException(
      "H264: coeff_token code outside implemented subset (0≤nC<2, " +
        "TotalCoeff ≤ 5)")
  }

  private def readTotalZeros1(r: BitReader): Int = {
    var code = 0
    var len = 0
    while (len < 9) {
      code = (code << 1) | r.readBit()
      len += 1
      var tz = 0
      while (tz < 16) {
        if (TotalZeros1(tz)._1 == len && TotalZeros1(tz)._2 == code)
          return tz
        tz += 1
      }
    }
    throw new IllegalArgumentException("H264: invalid total_zeros code")
  }

  /** Inverse Hadamard DC transform + dequantization at the fixed
    * QP-26 contract (8.5.10): f = H·c·H with the ±1 Hadamard rows,
    * then dcY = (f·13 + 2) >> 2 (LevelScale(26%6,0,0) = 13,
    * shift terms from qP/6 = 4). */
  private val HadamardRows: Array[Array[Int]] = Array(
    Array(1, 1, 1, 1), Array(1, 1, -1, -1),
    Array(1, -1, -1, 1), Array(1, -1, 1, -1))

  private def dequantDc26(c: Array[Array[Int]]): Array[Array[Int]] = {
    val f = Array.ofDim[Int](4, 4)
    for (i <- 0 until 4; j <- 0 until 4) {
      var s = 0
      for (k <- 0 until 4; l <- 0 until 4)
        s += HadamardRows(i)(k) * c(k)(l) * HadamardRows(j)(l)
      f(i)(j) = (s * 13 + 2) >> 2
    }
    f
  }

  // ------------------------------------------------------ I_4x4 layer
  /** luma4x4BlkIdx → pixel offset within the MB (the 2x2-quad Z
    * order of 6.4.3). */
  private def blk4x4Pos(idx: Int): (Int, Int) = {
    val quad = idx >> 2
    val sub = idx & 3
    ((((quad & 1) << 1) | (sub & 1)) * 4,
      (((quad >> 1) << 1) | (sub >> 1)) * 4)
  }

  /** predIntra4x4PredMode (8.3.1.1): min(left, top) block modes;
    * either neighbor outside the picture → DC (2); neighbors in
    * non-I4x4 MBs already hold 2 in the grid. */
  private def predMode4x4(grid: Array[Int], gw: Int, gx: Int,
                          gy: Int): Int =
    if (gx == 0 || gy == 0) 2
    else math.min(grid(gy * gw + gx - 1), grid((gy - 1) * gw + gx))

  /** Intra_4x4 prediction (8.3.1.2): V copies the 4 pixels above, H
    * the 4 left pixels, DC the rounded neighbor mean — operating on
    * the reconstructed plane so within-MB blocks chain correctly. */
  private def predict4x4(y: Array[Int], w: Int, x0: Int, y0: Int,
                         mode: Int): Unit = mode match {
    case 0 =>
      require(y0 > 0,
        "H264: Intra_4x4_Vertical requires an available top neighbor")
      for (px <- 0 until 4) {
        val v = y((y0 - 1) * w + x0 + px)
        for (py <- 0 until 4) y((y0 + py) * w + x0 + px) = v
      }
    case 1 =>
      require(x0 > 0,
        "H264: Intra_4x4_Horizontal requires an available left neighbor")
      for (py <- 0 until 4) {
        val v = y((y0 + py) * w + x0 - 1)
        for (px <- 0 until 4) y((y0 + py) * w + x0 + px) = v
      }
    case 2 =>
      val hasL = x0 > 0
      val hasT = y0 > 0
      var s = 0
      if (hasL) for (py <- 0 until 4) s += y((y0 + py) * w + x0 - 1)
      if (hasT) for (px <- 0 until 4) s += y((y0 - 1) * w + x0 + px)
      val dc =
        if (hasL && hasT) (s + 4) >> 3
        else if (hasL || hasT) (s + 2) >> 2
        else 128
      for (py <- 0 until 4; px <- 0 until 4)
        y((y0 + py) * w + x0 + px) = dc
    case m => throw new IllegalArgumentException(
      s"H264: intra4x4 pred mode $m unsupported (V/H/DC only)")
  }

  // ---------------------------------------------------------- decode
  final case class Frame(mbw: Int, mbh: Int, y: Array[Int],
                         cb: Array[Int], cr: Array[Int]) {
    def width: Int = mbw * 16
    def height: Int = mbh * 16
  }

  /** Decode a complete Annex B stream containing exactly one
    * picture. */
  def decode(bytes: Array[Byte]): Frame = {
    val fs = decodeSequence(bytes)
    require(fs.length == 1,
      s"H264: expected one picture, stream has ${fs.length} — " +
        "use decodeSequence")
    fs.head
  }

  /** Decode a complete Annex B stream (SPS + PPS + an IDR slice,
    * optionally followed by motion-compensated P slices) within the
    * documented subset. */
  def decodeSequence(bytes: Array[Byte]): Seq[Frame] = {
    val nals = splitNals(bytes)
    require(nals.nonEmpty, "H264: no NAL units")
    var mbw = -1
    var mbh = -1
    var log2MaxFrameNum = 4
    var sawSps = false
    var sawPps = false
    var lastRef: Frame = null // most recent REFERENCE picture
    val frames = scala.collection.mutable.ArrayBuffer.empty[Frame]
    for ((refIdc, nalType, payload) <- nals) {
      val r = new BitReader(unescapeRbsp(payload))
      nalType match {
        case 7 => // SPS
          val profile = r.u(8)
          r.u(8); r.u(8) // constraints, level
          require(profile == 66,
            s"H264: unsupported profile_idc $profile (baseline only)")
          r.ue() // sps id
          log2MaxFrameNum = r.ue() + 4
          val poc = r.ue()
          require(poc == 2, s"H264: unsupported pic_order_cnt_type $poc")
          r.ue() // max_num_ref_frames
          r.readBit() // gaps allowed
          mbw = r.ue() + 1
          mbh = r.ue() + 1
          require(r.readBit() == 1, "H264: interlaced streams unsupported")
          r.readBit() // direct_8x8
          require(r.readBit() == 0, "H264: frame cropping unsupported")
          r.readBit() // vui
          sawSps = true
        case 8 => // PPS
          r.ue(); r.ue()
          require(r.readBit() == 0, "H264: CABAC unsupported (CAVLC only)")
          r.readBit()
          require(r.ue() == 0, "H264: slice groups unsupported")
          r.ue(); r.ue(); r.readBit(); r.u(2)
          require(r.se() == 0,
            "H264: nonzero pic_init_qp unsupported (QP-26 contract)")
          r.se(); r.se()
          r.readBit() // deblocking control present (assumed 1 by writer)
          r.readBit(); r.readBit()
          sawPps = true
        case 5 => // IDR slice
          require(sawSps && sawPps, "H264: slice before SPS/PPS")
          val f = decodeSlice(r, mbw, mbh, log2MaxFrameNum)
          frames += f
          lastRef = f
        case 1 => // non-IDR (P or B) slice
          require(lastRef != null,
            "H264: inter slice before any reference picture")
          val f = decodeNonIdr(r, mbw, mbh, log2MaxFrameNum,
            lastRef, refIdc)
          frames += f
          if (refIdc > 0) lastRef = f
        case t => throw new IllegalArgumentException(
          s"H264: unsupported NAL type $t")
      }
    }
    require(frames.nonEmpty, "H264: no coded picture in stream")
    frames.toSeq
  }

  /** Dispatch a non-IDR slice on its slice_type: P (5/0) or B (6/1). */
  private def decodeNonIdr(r: BitReader, mbw: Int, mbh: Int,
                           log2MaxFrameNum: Int, ref: Frame,
                           refIdc: Int): Frame = {
    require(r.ue() == 0, "H264: multi-slice pictures unsupported")
    val st = r.ue()
    if (st == 5 || st == 0)
      decodePBody(r, mbw, mbh, log2MaxFrameNum, ref, refIdc)
    else if (st == 6 || st == 1)
      decodeBBody(r, mbw, mbh, log2MaxFrameNum, ref, refIdc)
    else throw new IllegalArgumentException(
      s"H264: unsupported slice_type $st for non-IDR (P/B only)")
  }

  /** One P slice against `ref`: mb_skip_run walk, P_L0_16x16 with
    * median-predicted motion, cbp 0 — each MB is a sub-pel
    * motion-compensated copy from the edge-clamped reference. */
  private def decodePBody(r: BitReader, mbw: Int, mbh: Int,
                          log2MaxFrameNum: Int, ref: Frame,
                          refIdc: Int): Frame = {
    r.ue() // pps id
    r.u(log2MaxFrameNum) // frame_num
    require(r.readBit() == 0,
      "H264: num_ref_idx override unsupported (one reference)")
    require(r.readBit() == 0,
      "H264: ref_pic_list_modification unsupported")
    if (refIdc > 0) require(r.readBit() == 0,
      "H264: adaptive ref-pic marking unsupported")
    require(r.se() == 0,
      "H264: nonzero slice_qp_delta unsupported (QP-26 contract)")
    require(r.ue() == 1,
      "H264: deblocking filter not implemented (writer disables it)")
    val w = mbw * 16
    val y = new Array[Int](w * mbh * 16)
    val cb = new Array[Int](w / 2 * mbh * 8)
    val cr = new Array[Int](w / 2 * mbh * 8)
    val mvs = Array.fill(mbw * mbh)((0, 0, -1))
    val total = mbw * mbh
    var i = 0
    def copyMb(idx: Int, vx: Int, vy: Int): Unit = {
      val mx = idx % mbw
      val my = idx / mbw
      motionCopy(ref, y, cb, cr, w, mx, my, vx, vy)
      mvs(idx) = (vx, vy, 0)
    }
    while (i < total) {
      val run = r.ue()
      require(i + run <= total, "H264: mb_skip_run overruns slice")
      var k = 0
      while (k < run) {
        val (sx, sy) = skipMv(mvs, mbw, i % mbw, i / mbw)
        copyMb(i, sx, sy)
        i += 1
        k += 1
      }
      if (i < total) {
        val mbType = r.ue()
        require(mbType == 0,
          s"H264: P mb_type $mbType unsupported (P_L0_16x16 only)")
        val (px, py) = mvPred16(mvs, mbw, i % mbw, i / mbw)
        val vx = px + r.se()
        val vy = py + r.se()
        require(r.ue() == 0,
          "H264: nonzero coded_block_pattern unsupported for P MBs")
        copyMb(i, vx, vy)
        i += 1
      }
    }
    require(r.readBit() == 1, "H264: missing rbsp_stop_one_bit")
    Frame(mbw, mbh, y, cb, cr)
  }

  /** One B slice against `ref` (both default lists = [ref], the one
    * reference in the DPB): B_L0_16x16 / B_L1_16x16 / B_Bi_16x16
    * with per-list median mvd prediction, cbp 0; bi-prediction is
    * the default average (predL0 + predL1 + 1) >> 1. B_Skip and
    * B_Direct are rejected by name (they need direct-mode motion
    * inference). */
  private def decodeBBody(r: BitReader, mbw: Int, mbh: Int,
                          log2MaxFrameNum: Int, ref: Frame,
                          refIdc: Int): Frame = {
    r.ue() // pps id
    r.u(log2MaxFrameNum) // frame_num
    r.readBit() // direct_spatial_mv_pred_flag (no direct MBs here)
    require(r.readBit() == 0,
      "H264: num_ref_idx override unsupported (one reference)")
    require(r.readBit() == 0,
      "H264: ref_pic_list_modification (L0) unsupported")
    require(r.readBit() == 0,
      "H264: ref_pic_list_modification (L1) unsupported")
    if (refIdc > 0) require(r.readBit() == 0,
      "H264: adaptive ref-pic marking unsupported")
    require(r.se() == 0,
      "H264: nonzero slice_qp_delta unsupported (QP-26 contract)")
    require(r.ue() == 1,
      "H264: deblocking filter not implemented (writer disables it)")
    val w = mbw * 16
    val y = new Array[Int](w * mbh * 16)
    val cb = new Array[Int](w / 2 * mbh * 8)
    val cr = new Array[Int](w / 2 * mbh * 8)
    val mv0 = Array.fill(mbw * mbh)((0, 0, -1))
    val mv1 = Array.fill(mbw * mbh)((0, 0, -1))
    val total = mbw * mbh
    var i = 0
    while (i < total) {
      require(r.ue() == 0,
        "H264: B_Skip/B_Direct unsupported (explicit-motion subset)")
      val mbType = r.ue()
      val mx = i % mbw
      val my = i / mbw
      mbType match {
        case 1 => // B_L0_16x16
          val (px, py) = mvPred16(mv0, mbw, mx, my)
          val vx = px + r.se(); val vy = py + r.se()
          require(r.ue() == 0,
            "H264: nonzero coded_block_pattern unsupported for B MBs")
          motionCopy(ref, y, cb, cr, w, mx, my, vx, vy)
          mv0(i) = (vx, vy, 0)
        case 2 => // B_L1_16x16
          val (px, py) = mvPred16(mv1, mbw, mx, my)
          val vx = px + r.se(); val vy = py + r.se()
          require(r.ue() == 0,
            "H264: nonzero coded_block_pattern unsupported for B MBs")
          motionCopy(ref, y, cb, cr, w, mx, my, vx, vy)
          mv1(i) = (vx, vy, 0)
        case 3 => // B_Bi_16x16
          val (p0x, p0y) = mvPred16(mv0, mbw, mx, my)
          val (p1x, p1y) = mvPred16(mv1, mbw, mx, my)
          val v0x = p0x + r.se(); val v0y = p0y + r.se()
          val v1x = p1x + r.se(); val v1y = p1y + r.se()
          require(r.ue() == 0,
            "H264: nonzero coded_block_pattern unsupported for B MBs")
          biMotionCopy(ref, y, cb, cr, w, mx, my, v0x, v0y, v1x, v1y)
          mv0(i) = (v0x, v0y, 0)
          mv1(i) = (v1x, v1y, 0)
        case t => throw new IllegalArgumentException(
          s"H264: B mb_type $t unsupported (L0/L1/Bi 16x16 only)")
      }
      i += 1
    }
    require(r.readBit() == 1, "H264: missing rbsp_stop_one_bit")
    Frame(mbw, mbh, y, cb, cr)
  }

  /** Bi-predicted MB: the default-weight average of the two
    * motion-compensated predictions (8.4.2.3 with
    * weighted_bipred_idc 0). */
  private def biMotionCopy(ref: Frame, y: Array[Int], cb: Array[Int],
                           cr: Array[Int], w: Int, mx: Int, my: Int,
                           v0x: Int, v0y: Int, v1x: Int,
                           v1y: Int): Unit = {
    val h = ref.mbh * 16
    val x0 = mx * 16; val y0 = my * 16
    for (py <- 0 until 16; px <- 0 until 16) {
      val a = lumaSubpel(ref.y, w, h, x0 + px, y0 + py, v0x, v0y)
      val b = lumaSubpel(ref.y, w, h, x0 + px, y0 + py, v1x, v1y)
      y((y0 + py) * w + x0 + px) = (a + b + 1) >> 1
    }
    val cw = w / 2
    val chh = h / 2
    val cx0 = mx * 8; val cy0 = my * 8
    for (py <- 0 until 8; px <- 0 until 8) {
      val a0 = chromaSubpel(ref.cb, cw, chh, cx0 + px, cy0 + py,
        v0x, v0y)
      val a1 = chromaSubpel(ref.cb, cw, chh, cx0 + px, cy0 + py,
        v1x, v1y)
      cb((cy0 + py) * cw + cx0 + px) = (a0 + a1 + 1) >> 1
      val b0 = chromaSubpel(ref.cr, cw, chh, cx0 + px, cy0 + py,
        v0x, v0y)
      val b1 = chromaSubpel(ref.cr, cw, chh, cx0 + px, cy0 + py,
        v1x, v1y)
      cr((cy0 + py) * cw + cx0 + px) = (b0 + b1 + 1) >> 1
    }
  }

  /** Motion-compensated copy of one 16x16 MB from the reference at
    * FULL quarter-pel luma / eighth-pel chroma resolution (8.4.2.2):
    * the 6-tap (1,−5,20,20,−5,1) half-pel filter with +16>>5
    * rounding, the center position j from unrounded intermediates
    * (+512>>10), quarter positions as +1>>1 averages of the spec's
    * neighbor pairs, chroma as the (8−xF)(8−yF) bilinear — every
    * stage exact integer arithmetic, reference edge-clamped per the
    * spec's boundary replication. */
  private def motionCopy(ref: Frame, y: Array[Int], cb: Array[Int],
                         cr: Array[Int], w: Int, mx: Int, my: Int,
                         vxQ: Int, vyQ: Int): Unit = {
    val h = ref.mbh * 16
    val x0 = mx * 16; val y0 = my * 16
    for (py <- 0 until 16; px <- 0 until 16)
      y((y0 + py) * w + x0 + px) =
        lumaSubpel(ref.y, w, h, x0 + px, y0 + py, vxQ, vyQ)
    val cw = w / 2
    val chh = h / 2
    val cx0 = mx * 8; val cy0 = my * 8
    for (py <- 0 until 8; px <- 0 until 8) {
      cb((cy0 + py) * cw + cx0 + px) =
        chromaSubpel(ref.cb, cw, chh, cx0 + px, cy0 + py, vxQ, vyQ)
      cr((cy0 + py) * cw + cx0 + px) =
        chromaSubpel(ref.cr, cw, chh, cx0 + px, cy0 + py, vxQ, vyQ)
    }
  }

  /** One luma sample at quarter-pel position (8.4.2.2.1/2). */
  private def lumaSubpel(refY: Array[Int], w: Int, h: Int, x: Int,
                         y: Int, mvx: Int, mvy: Int): Int = {
    val xI = x + (mvx >> 2)
    val yI = y + (mvy >> 2)
    val xF = mvx & 3
    val yF = mvy & 3
    def P(dx: Int, dy: Int): Int = {
      val sx = math.max(0, math.min(w - 1, xI + dx))
      val sy = math.max(0, math.min(h - 1, yI + dy))
      refY(sy * w + sx)
    }
    def clip(v: Int): Int = math.max(0, math.min(255, v))
    def bRaw(dy: Int): Int = P(-2, dy) - 5 * P(-1, dy) +
      20 * P(0, dy) + 20 * P(1, dy) - 5 * P(2, dy) + P(3, dy)
    def hRaw(dx: Int): Int = P(dx, -2) - 5 * P(dx, -1) +
      20 * P(dx, 0) + 20 * P(dx, 1) - 5 * P(dx, 2) + P(dx, 3)
    lazy val b = clip((bRaw(0) + 16) >> 5)
    lazy val hv = clip((hRaw(0) + 16) >> 5)
    lazy val m = clip((hRaw(1) + 16) >> 5)
    lazy val s = clip((bRaw(1) + 16) >> 5)
    lazy val j = clip((bRaw(-2) - 5 * bRaw(-1) + 20 * bRaw(0) +
      20 * bRaw(1) - 5 * bRaw(2) + bRaw(3) + 512) >> 10)
    (xF, yF) match {
      case (0, 0) => P(0, 0)
      case (1, 0) => (P(0, 0) + b + 1) >> 1
      case (2, 0) => b
      case (3, 0) => (P(1, 0) + b + 1) >> 1
      case (0, 1) => (P(0, 0) + hv + 1) >> 1
      case (0, 2) => hv
      case (0, 3) => (P(0, 1) + hv + 1) >> 1
      case (1, 1) => (b + hv + 1) >> 1
      case (3, 1) => (b + m + 1) >> 1
      case (1, 3) => (hv + s + 1) >> 1
      case (3, 3) => (m + s + 1) >> 1
      case (2, 1) => (b + j + 1) >> 1
      case (2, 2) => j
      case (2, 3) => (j + s + 1) >> 1
      case (1, 2) => (hv + j + 1) >> 1
      case (3, 2) => (j + m + 1) >> 1
    }
  }

  /** One chroma sample at eighth-pel position: the spec's bilinear
    * ((8−xF)(8−yF)A + xF(8−yF)B + (8−xF)yF C + xF·yF·D + 32) >> 6. */
  private def chromaSubpel(p: Array[Int], cw: Int, ch: Int, x: Int,
                           y: Int, mvx: Int, mvy: Int): Int = {
    val xI = x + (mvx >> 3)
    val yI = y + (mvy >> 3)
    val xf = mvx & 7
    val yf = mvy & 7
    def C(dx: Int, dy: Int): Int = {
      val sx = math.max(0, math.min(cw - 1, xI + dx))
      val sy = math.max(0, math.min(ch - 1, yI + dy))
      p(sy * cw + sx)
    }
    ((8 - xf) * (8 - yf) * C(0, 0) + xf * (8 - yf) * C(1, 0) +
      (8 - xf) * yf * C(0, 1) + xf * yf * C(1, 1) + 32) >> 6
  }

  private def splitNals(bytes: Array[Byte])
      : Seq[(Int, Int, Array[Byte])] = {
    val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i + 3 < bytes.length) {
      if (bytes(i) == 0 && bytes(i + 1) == 0 &&
        (bytes(i + 2) == 1 ||
          (bytes(i + 2) == 0 && i + 4 <= bytes.length &&
            bytes(i + 3) == 1))) {
        val hdr = if (bytes(i + 2) == 1) i + 3 else i + 4
        starts += hdr
        i = hdr
      } else i += 1
    }
    starts.toSeq.zipWithIndex.map { case (hdr, k) =>
      val end =
        if (k + 1 < starts.length) {
          // back off over the next start code (3 or 4 bytes)
          val n = starts(k + 1)
          if (bytes(n - 4) == 0) n - 4 else n - 3
        } else bytes.length
      val h = bytes(hdr) & 0xff
      require((h & 0x80) == 0, "H264: forbidden_zero_bit set")
      ((h >> 5) & 3, h & 0x1f, bytes.slice(hdr + 1, end))
    }
  }

  private def decodeSlice(r: BitReader, mbw: Int, mbh: Int,
                          log2MaxFrameNum: Int): Frame = {
    require(r.ue() == 0, "H264: multi-slice pictures unsupported")
    val sliceType = r.ue()
    require(sliceType == 7 || sliceType == 2,
      s"H264: unsupported slice_type $sliceType (I only)")
    r.ue() // pps id
    r.u(log2MaxFrameNum) // frame_num
    r.ue() // idr_pic_id
    r.readBit(); r.readBit() // dec_ref_pic_marking
    require(r.se() == 0,
      "H264: nonzero slice_qp_delta unsupported (QP-26 contract)")
    val disableDeblock = r.ue()
    require(disableDeblock == 1,
      "H264: deblocking filter not implemented (writer disables it)")
    val w = mbw * 16
    val y = new Array[Int](w * mbh * 16)
    val cb = new Array[Int](w / 2 * mbh * 8)
    val cr = new Array[Int](w / 2 * mbh * 8)
    val tc = Array.fill(mbw * mbh)(0)
    val modeGrid = Array.fill(mbw * 4 * mbh * 4)(2)
    for (my <- 0 until mbh; mx <- 0 until mbw) {
      val mbType = r.ue()
      mbType match {
        case 25 => // I_PCM
          r.align()
          val x0 = mx * 16; val y0 = my * 16
          for (py <- 0 until 16; px <- 0 until 16)
            y((y0 + py) * w + x0 + px) = r.readByteAligned()
          val cx0 = mx * 8; val cy0 = my * 8
          for (py <- 0 until 8; px <- 0 until 8)
            cb((cy0 + py) * (w / 2) + cx0 + px) = r.readByteAligned()
          for (py <- 0 until 8; px <- 0 until 8)
            cr((cy0 + py) * (w / 2) + cx0 + px) = r.readByteAligned()
          tc(my * mbw + mx) = 16
        case 0 => // I_NxN: per-4x4-block intra prediction, cbp 0
          val modes = new Array[Int](16)
          for (b <- 0 until 16) {
            val (bx, by) = blk4x4Pos(b)
            val gx = mx * 4 + bx / 4
            val gy = my * 4 + by / 4
            val pred = predMode4x4(modeGrid, mbw * 4, gx, gy)
            val m =
              if (r.readBit() == 1) pred
              else {
                val rem = r.u(3)
                if (rem < pred) rem else rem + 1
              }
            require(m <= 2,
              s"H264: intra4x4 pred mode $m unsupported (V/H/DC only)")
            modeGrid(gy * mbw * 4 + gx) = m
            modes(b) = m
          }
          val chromaPred = r.ue()
          require(chromaPred == 0,
            s"H264: chroma pred mode $chromaPred unsupported (DC only)")
          val cbpCode = r.ue()
          require(cbpCode == 3, // Table 9-4 intra: codeNum 3 → cbp 0
            "H264: nonzero coded_block_pattern unsupported for I_4x4 " +
              "(prediction-only subset)")
          // cbp 0 → no mb_qp_delta, no residual; reconstruct in
          // blkIdx order so within-MB blocks see decoded pixels
          for (b <- 0 until 16) {
            val (bx, by) = blk4x4Pos(b)
            predict4x4(y, w, mx * 16 + bx, my * 16 + by, modes(b))
          }
          predictChromaDc(cb, w / 2, mx, my)
          predictChromaDc(cr, w / 2, mx, my)
          tc(my * mbw + mx) = 0
        case 3 => // I_16x16, DC pred, cbp 0 (DC residual allowed)
          val chromaPred = r.ue()
          require(chromaPred == 0,
            s"H264: chroma pred mode $chromaPred unsupported (DC only)")
          require(r.se() == 0,
            "H264: nonzero mb_qp_delta unsupported (QP-26 contract)")
          val nC = dcNc(tc, mbw, mx, my)
          val (totalCoeff, trailingOnes) =
            if (nC >= 8) {
              val code = r.u(6)
              if (code == 3) (0, 0) else ((code >> 2) + 1, code & 3)
            } else if (nC < 2) readCoeffTokenNc0(r)
            else throw new IllegalArgumentException(
              s"H264: coeff_token VLC column for nC=$nC not " +
                "implemented (0≤nC<2 and nC≥8 only)")
          require(totalCoeff <= 1,
            "H264: DC residual blocks with TotalCoeff > 1 unsupported " +
              "(single-coefficient subset)")
          val pred = dcPredValue(y, w, mx, my)
          val x0 = mx * 16; val y0 = my * 16
          if (totalCoeff == 0) {
            for (py <- 0 until 16; px <- 0 until 16)
              y((y0 + py) * w + x0 + px) = pred
          } else {
            val level =
              if (trailingOnes == 1) { if (r.readBit() == 1) -1 else 1 }
              else readLevel(r, trailingOnes = 0)
            val tz = readTotalZeros1(r)
            // TotalCoeff 1: total_zeros IS the coefficient's zigzag
            // index; no run_before follows
            val c = Array.ofDim[Int](4, 4)
            val (zr, zc) = Zigzag4x4(tz)
            c(zr)(zc) = level
            val dcY = dequantDc26(c)
            for (bi <- 0 until 4; bj <- 0 until 4) {
              // all-zero AC ⇒ each 4x4 block's residual is the
              // constant (dcY + 32) >> 6 (8.5.12.2 with DC only)
              val rblk = (dcY(bi)(bj) + 32) >> 6
              val v = math.max(0, math.min(255, pred + rblk))
              for (py <- 0 until 4; px <- 0 until 4)
                y((y0 + bi * 4 + py) * w + x0 + bj * 4 + px) = v
            }
          }
          predictChromaDc(cb, w / 2, mx, my)
          predictChromaDc(cr, w / 2, mx, my)
          tc(my * mbw + mx) = 0
        case t => throw new IllegalArgumentException(
          s"H264: unsupported mb_type $t " +
            "(I_PCM, I_NxN, and DC-predicted I_16x16 only)")
      }
    }
    require(r.readBit() == 1, "H264: missing rbsp_stop_one_bit")
    Frame(mbw, mbh, y, cb, cr)
  }

  /** Intra_16x16 DC prediction value, 8.3.3.1. */
  private def dcPredValue(y: Array[Int], w: Int, mx: Int,
                          my: Int): Int = {
    val x0 = mx * 16; val y0 = my * 16
    val hasLeft = mx > 0
    val hasTop = my > 0
    var sum = 0
    if (hasLeft) for (py <- 0 until 16) sum += y((y0 + py) * w + x0 - 1)
    if (hasTop) for (px <- 0 until 16) sum += y((y0 - 1) * w + x0 + px)
    if (hasLeft && hasTop) (sum + 16) >> 5
    else if (hasLeft || hasTop) (sum + 8) >> 4
    else 128
  }

  /** Chroma DC prediction (8.3.4, mode 0) over an 8×8 plane block:
    * per-4×4 sub-block means — corner blocks use both neighbor
    * groups, edge-adjacent blocks their aligned group, matching the
    * spec's per-sub-block source selection. */
  private def predictChromaDc(c: Array[Int], w: Int, mx: Int,
                              my: Int): Unit = {
    val x0 = mx * 8; val y0 = my * 8
    val hasLeft = mx > 0
    val hasTop = my > 0
    def leftSum(fromY: Int): Int =
      (0 until 4).map(i => c((y0 + fromY + i) * w + x0 - 1)).sum
    def topSum(fromX: Int): Int =
      (0 until 4).map(i => c((y0 - 1) * w + x0 + fromX + i)).sum
    def dcOf(useL: Boolean, useT: Boolean, fy: Int, fx: Int): Int =
      if (useL && useT) (leftSum(fy) + topSum(fx) + 4) >> 3
      else if (useL) (leftSum(fy) + 2) >> 2
      else if (useT) (topSum(fx) + 2) >> 2
      else 128
    // sub-blocks: (0,0) both; (4,0) top else left; (0,4) left else
    // top; (4,4) both
    val dcs = Array(
      dcOf(hasLeft, hasTop, 0, 0),
      if (hasTop) dcOf(useL = false, useT = true, 0, 4)
      else dcOf(hasLeft, useT = false, 0, 4),
      if (hasLeft) dcOf(useL = true, useT = false, 4, 0)
      else dcOf(useL = false, hasTop, 4, 0),
      dcOf(hasLeft, hasTop, 4, 4))
    for (sb <- 0 until 4) {
      val sx = (sb & 1) * 4; val sy = (sb >> 1) * 4
      for (py <- 0 until 4; px <- 0 until 4)
        c((y0 + sy + py) * w + x0 + sx + px) = dcs(sb)
    }
  }
}
