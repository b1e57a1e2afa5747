package graft.ext

/** From-spec ZIP archive codec (the public PKWARE APPNOTE layout) —
  * the OTHER dataset-bundle container next to [[TarBlob]], and the
  * structurally interesting one: the authoritative member list is
  * the CENTRAL DIRECTORY at the END of the file, so correct
  * enumeration scans backwards for the end-of-central-directory
  * record and walks entries by their recorded local offsets — never
  * by sniffing local headers forward (the classic wrong walk that
  * breaks on nested zips and overlapping data). Implemented:
  *
  *  - local file headers (PK\3\4), central entries (PK\1\2), and the
  *    EOCD (PK\5\6) with a trailing-comment-tolerant backward scan;
  *  - STORED (0) and DEFLATE (8) methods — raw deflate via
  *    `java.util.zip` with nowrap, as the format specifies;
  *  - CRC-32 and uncompressed-size verification on every member
  *    (both recorded in the central entry);
  *  - central/local name agreement checked, data located via the
  *    central entry's offset.
  *
  * Scale shape: blob-level behind the [[Multimodal]] seam. */
object ZipBlob {

  final case class Entry(name: String, content: Array[Byte],
                         deflate: Boolean)

  private def le16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }
  private def le32(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
    out.write(((v >> 16) & 0xff).toInt)
    out.write(((v >> 24) & 0xff).toInt)
  }

  private def deflateRaw(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(b); d.finish()
    val buf = new Array[Byte](b.length + 64)
    val bo = new java.io.ByteArrayOutputStream()
    while (!d.finished()) bo.write(buf, 0, d.deflate(buf))
    d.end()
    bo.toByteArray
  }

  private def inflateRaw(b: Array[Byte], expect: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater(true)
    inf.setInput(b)
    val out = new Array[Byte](expect)
    var got = 0
    while (got < expect && !inf.finished()) {
      val k = inf.inflate(out, got, expect - got)
      require(k > 0 || inf.finished() || !inf.needsInput(),
        "ZIP: truncated deflate stream")
      got += k
    }
    inf.end()
    require(got == expect, "ZIP: deflate stream shorter than recorded")
    out
  }

  def encode(entries: Seq[Entry]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val centrals = scala.collection.mutable.ArrayBuffer
      .empty[(Entry, Long, Long, Int)] // entry, offset, crc, csize
    entries.foreach { e =>
      val off = out.size().toLong
      val crc = new java.util.zip.CRC32()
      crc.update(e.content)
      val data = if (e.deflate) deflateRaw(e.content) else e.content
      val name = e.name.getBytes("US-ASCII")
      le32(out, 0x04034b50L) // local header signature
      le16(out, 20); le16(out, 0) // version needed, flags
      le16(out, if (e.deflate) 8 else 0)
      le16(out, 0); le16(out, 0x5000) // dos time/date (fixed)
      le32(out, crc.getValue)
      le32(out, data.length.toLong)
      le32(out, e.content.length.toLong)
      le16(out, name.length); le16(out, 0)
      out.write(name, 0, name.length)
      out.write(data, 0, data.length)
      centrals += ((e, off, crc.getValue, data.length))
    }
    val cdOff = out.size().toLong
    centrals.foreach { case (e, off, crc, csize) =>
      val name = e.name.getBytes("US-ASCII")
      le32(out, 0x02014b50L)
      le16(out, 20); le16(out, 20); le16(out, 0)
      le16(out, if (e.deflate) 8 else 0)
      le16(out, 0); le16(out, 0x5000)
      le32(out, crc)
      le32(out, csize.toLong)
      le32(out, e.content.length.toLong)
      le16(out, name.length); le16(out, 0); le16(out, 0)
      le16(out, 0); le16(out, 0); le32(out, 0L)
      le32(out, off)
      out.write(name, 0, name.length)
    }
    val cdSize = out.size().toLong - cdOff
    le32(out, 0x06054b50L)
    le16(out, 0); le16(out, 0)
    le16(out, entries.length); le16(out, entries.length)
    le32(out, cdSize); le32(out, cdOff)
    le16(out, 0)
    out.toByteArray
  }

  private def rd16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  private def rd32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  final case class Member(name: String, size: Long, method: Long,
                          content: Array[Byte])

  def decode(bytes: Array[Byte]): Seq[Member] = {
    // backward scan for EOCD (a trailing archive comment may follow)
    var eocd = -1
    var i = bytes.length - 22
    while (eocd < 0 && i >= 0) {
      if (rd32(bytes, i) == 0x06054b50L &&
        i + 22 + rd16(bytes, i + 20) == bytes.length) eocd = i
      else i -= 1
    }
    require(eocd >= 0, "ZIP: no end-of-central-directory record")
    val n = rd16(bytes, eocd + 10)
    val cd0 = rd32(bytes, eocd + 16)
    require(cd0 != 0xffffffffL,
      "ZIP: ZIP64 end-of-central-directory unsupported")
    require(cd0 + 46L * n <= bytes.length,
      "ZIP: central directory offset exceeds stream")
    var cd = cd0.toInt
    val out = scala.collection.mutable.ArrayBuffer.empty[Member]
    for (_ <- 0 until n) {
      require(cd + 46 <= bytes.length &&
        rd32(bytes, cd) == 0x02014b50L,
        "ZIP: malformed central directory entry")
      val method = rd16(bytes, cd + 10)
      require(method == 0 || method == 8,
        s"ZIP: compression method $method unsupported (stored/deflate)")
      val crc = rd32(bytes, cd + 16)
      // Keep the 32-bit size/offset fields as Long: narrowing ≥2^31
      // values to Int wraps negative and defeats every bounds check
      // below. The all-ones sentinel means "see ZIP64 extra field",
      // which this codec rejects by name rather than mis-reading.
      val csize = rd32(bytes, cd + 20)
      val usize = rd32(bytes, cd + 24)
      require(csize != 0xffffffffL && usize != 0xffffffffL,
        "ZIP: ZIP64 member sizes unsupported")
      require(csize <= bytes.length && usize <= Int.MaxValue.toLong,
        "ZIP: member size exceeds stream")
      val nameLen = rd16(bytes, cd + 28)
      val extraLen = rd16(bytes, cd + 30)
      val commentLen = rd16(bytes, cd + 32)
      val off = rd32(bytes, cd + 42)
      require(off != 0xffffffffL, "ZIP: ZIP64 member offset unsupported")
      require(off + 30L <= bytes.length,
        "ZIP: central entry offset exceeds stream")
      // the variable-length tail (name + extra + comment) must fit too,
      // or the name read below walks off a truncated buffer unnamed
      require(cd + 46L + nameLen + extraLen + commentLen <= bytes.length,
        "ZIP: truncated central directory entry")
      val name = new String(bytes, cd + 46, nameLen, "US-ASCII")
      // local header: its own (possibly different-length) name/extra
      require(rd32(bytes, off.toInt) == 0x04034b50L,
        "ZIP: central entry points at no local header")
      val lNameLen = rd16(bytes, off.toInt + 26)
      val lExtraLen = rd16(bytes, off.toInt + 28)
      require(new String(bytes, off.toInt + 30, lNameLen,
        "US-ASCII") == name, "ZIP: central/local name mismatch")
      val dataAt = off + 30L + lNameLen + lExtraLen
      require(dataAt + csize <= bytes.length, "ZIP: truncated member")
      val raw = java.util.Arrays.copyOfRange(bytes, dataAt.toInt,
        (dataAt + csize).toInt)
      val content =
        if (method == 8) inflateRaw(raw, usize.toInt)
        else { require(csize == usize, "ZIP: stored size mismatch"); raw }
      val check = new java.util.zip.CRC32()
      check.update(content)
      require(check.getValue == crc, s"ZIP: CRC mismatch for '$name'")
      out += Member(name, usize.toLong, method.toLong, content)
      cd += 46 + nameLen + extraLen + commentLen
    }
    out.toSeq
  }
}
