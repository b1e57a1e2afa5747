package graft.ext

import java.nio.ByteBuffer
import java.util.zip.{CRC32, Deflater, Inflater}

/** Minimal pure-JVM PNG codec — the COMPRESSED image format next to
  * [[BmpCodec]]'s uncompressed one, completing the codec quartet
  * (BMP raw image, PNG zlib image, WAV audio, Y4M video). Zero
  * dependencies beyond `java.util.zip` (CRC32 + DEFLATE, both in the
  * JDK): 8-bit-depth truecolor (color type 2), all five scanline
  * filters.
  *
  * The decoder is a real chunk walker, not a fixed-offset slice: it
  * validates the 8-byte signature, walks length/type/data/CRC chunks
  * verifying EVERY chunk's CRC32, requires IHDR first (8-bit,
  * truecolor, deflate/adaptive-filter/no-interlace), concatenates all
  * IDAT payloads into one zlib stream, inflates, and reconstructs
  * each scanline through its declared filter — None/Sub/Up/Average/
  * Paeth, the full adaptive-filter family. Malformed input fails fast
  * naming the violated invariant.
  *
  * The ENCODER deliberately cycles the filter type per row
  * (y mod 5), so the e116 gate exercises every reconstruction path on
  * every image — a Paeth-predictor or stride bug cannot survive the
  * closed-form pixel oracle. */
object PngCodec {

  private val Signature =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(12 + data.length)
    bb.putInt(data.length)
    val tb = typ.getBytes("US-ASCII")
    bb.put(tb).put(data)
    val crc = new CRC32
    crc.update(tb); crc.update(data)
    bb.putInt(crc.getValue.toInt)
    bb.array()
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode a top-down row-major `0xRRGGBB` pixel array as a PNG blob
    * (8-bit truecolor, per-row filter type = y mod 5). */
  def encodeRgb24(width: Int, height: Int,
                  pixels: Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(pixels.length == width * height,
      s"${pixels.length} pixels for ${width}x$height")
    val bpp = 3
    val stride = width * bpp
    val raw = new Array[Byte](height * stride)
    var i = 0
    while (i < pixels.length) {
      val p = pixels(i)
      raw(i * 3) = ((p >> 16) & 0xff).toByte
      raw(i * 3 + 1) = ((p >> 8) & 0xff).toByte
      raw(i * 3 + 2) = (p & 0xff).toByte
      i += 1
    }
    // filter each row with type (y mod 5); prior = reconstructed row
    // above, which for these filters is just the raw bytes
    val filtered = new Array[Byte](height * (stride + 1))
    var y = 0
    while (y < height) {
      val ft = y % 5
      filtered(y * (stride + 1)) = ft.toByte
      var x = 0
      while (x < stride) {
        val cur = raw(y * stride + x) & 0xff
        val left = if (x >= bpp) raw(y * stride + x - bpp) & 0xff else 0
        val up = if (y > 0) raw((y - 1) * stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= bpp)
          raw((y - 1) * stride + x - bpp) & 0xff else 0
        val f = ft match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, ul)
        }
        filtered(y * (stride + 1) + 1 + x) = (f & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val defl = new Deflater(Deflater.DEFAULT_COMPRESSION)
    defl.setInput(filtered); defl.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished())
      out.write(buf, 0, defl.deflate(buf))
    defl.end()
    val ihdr = ByteBuffer.allocate(13)
    ihdr.putInt(width).putInt(height)
    ihdr.put(8.toByte)  // bit depth
    ihdr.put(2.toByte)  // truecolor
    ihdr.put(0.toByte).put(0.toByte).put(0.toByte) // zlib/adaptive/none
    Signature ++ chunk("IHDR", ihdr.array()) ++
      chunk("IDAT", out.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Decode a PNG blob: returns (width, height, top-down row-major
    * `0xRRGGBB` pixels). Fails fast on anything outside the encoder's
    * profile (8-bit truecolor, no interlace) or on any corrupt
    * signature/CRC/zlib/filter byte. */
  def decodeRgb24(png: Array[Byte]): (Int, Int, Array[Int]) = {
    require(png.length >= 8 &&
      png.take(8).sameElements(Signature), "not a PNG signature")
    val bb = ByteBuffer.wrap(png, 8, png.length - 8)
    var w = 0; var h = 0; var sawIhdr = false; var sawEnd = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!sawEnd) {
      require(bb.remaining() >= 12, "truncated chunk header")
      val len = bb.getInt
      require(len >= 0 && bb.remaining() >= len + 8,
        s"truncated chunk body (len=$len)")
      val tb = new Array[Byte](4); bb.get(tb)
      val typ = new String(tb, "US-ASCII")
      val data = new Array[Byte](len); bb.get(data)
      val crc = new CRC32
      crc.update(tb); crc.update(data)
      require(bb.getInt == crc.getValue.toInt, s"bad CRC on $typ")
      typ match {
        case "IHDR" =>
          require(!sawIhdr, "duplicate IHDR")
          require(len == 13, s"IHDR length $len")
          val ib = ByteBuffer.wrap(data)
          w = ib.getInt; h = ib.getInt
          require(w > 0 && h > 0 && w <= 65535 && h <= 65535,
            s"bad dimensions ${w}x$h")
          require(ib.get() == 8, "only 8-bit depth supported")
          require(ib.get() == 2, "only truecolor (type 2) supported")
          require(ib.get() == 0 && ib.get() == 0 && ib.get() == 0,
            "compression/filter/interlace must be 0/0/0")
          sawIhdr = true
        case "IDAT" =>
          require(sawIhdr, "IDAT before IHDR")
          idat.write(data)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks skipped (CRC still verified)
      }
    }
    require(sawIhdr, "missing IHDR")
    val bpp = 3
    val stride = w * bpp
    val raw = new Array[Byte](h * (stride + 1))
    val infl = new Inflater()
    infl.setInput(idat.toByteArray)
    var off = 0
    while (off < raw.length && !infl.finished()) {
      val n = infl.inflate(raw, off, raw.length - off)
      require(n > 0 || infl.finished() || !infl.needsInput(),
        "truncated zlib stream")
      off += n
    }
    infl.end()
    require(off == raw.length,
      s"inflated $off of ${raw.length} filtered bytes")
    // reconstruct scanlines in place into `px`
    val px = new Array[Int](w * h)
    val recon = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val ft = raw(y * (stride + 1)) & 0xff
      require(ft <= 4, s"bad filter type $ft on row $y")
      var x = 0
      while (x < stride) {
        val f = raw(y * (stride + 1) + 1 + x) & 0xff
        val left = if (x >= bpp) recon(y * stride + x - bpp) & 0xff
          else 0
        val up = if (y > 0) recon((y - 1) * stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= bpp)
          recon((y - 1) * stride + x - bpp) & 0xff else 0
        val r = ft match {
          case 0 => f
          case 1 => f + left
          case 2 => f + up
          case 3 => f + (left + up) / 2
          case 4 => f + paeth(left, up, ul)
        }
        recon(y * stride + x) = (r & 0xff).toByte
        x += 1
      }
      var xp = 0
      while (xp < w) {
        px(y * w + xp) =
          ((recon(y * stride + xp * 3) & 0xff) << 16) |
            ((recon(y * stride + xp * 3 + 1) & 0xff) << 8) |
            (recon(y * stride + xp * 3 + 2) & 0xff)
        xp += 1
      }
      y += 1
    }
    (w, h, px)
  }
}
