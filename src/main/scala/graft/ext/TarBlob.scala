package graft.ext

/** From-spec ustar TAR archive codec (the POSIX.1-1988 format, public
  * everywhere) — the dataset-DISTRIBUTION container: academic corpora
  * and shard bundles ship as .tar(.gz), and enumerating members
  * without extraction is the ingest planner's first pass. All fields
  * are implemented for real:
  *
  *  - 512-byte headers: name, mode/uid/gid, OCTAL size and mtime
  *    (space/NUL-terminated per the spec), typeflag, the `ustar`
  *    magic;
  *  - the header CHECKSUM — the byte sum with the checksum field
  *    read as spaces — VERIFIED on every member (a corrupted header
  *    fails by name, never yields a garbage size that desyncs the
  *    walk);
  *  - content padded to 512-byte blocks; the two zero-block
  *    end-of-archive marker.
  *
  * Scale shape: blob-level behind the [[Multimodal]] seam — each
  * archive enumerates partition-locally, one row per member. */
object TarBlob {

  final case class Member(name: String, size: Long, mtime: Long,
                          content: Array[Byte])

  private def writeOctal(h: Array[Byte], off: Int, len: Int,
                         v: Long): Unit = {
    val s = java.lang.Long.toOctalString(v)
    val padded = ("0" * (len - 1 - s.length)) + s
    require(padded.length == len - 1, s"octal field overflow: $v")
    var i = 0
    while (i < len - 1) { h(off + i) = padded.charAt(i).toByte; i += 1 }
    h(off + len - 1) = 0
  }

  private def writeStr(h: Array[Byte], off: Int, s: String): Unit = {
    val b = s.getBytes("US-ASCII")
    System.arraycopy(b, 0, h, off, b.length)
  }

  def encode(members: Seq[Member]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    members.foreach { m =>
      val h = new Array[Byte](512)
      require(m.name.length < 100, "name too long for ustar")
      writeStr(h, 0, m.name)
      writeOctal(h, 100, 8, 420) // mode 0644
      writeOctal(h, 108, 8, 0) // uid
      writeOctal(h, 116, 8, 0) // gid
      writeOctal(h, 124, 12, m.content.length.toLong)
      writeOctal(h, 136, 12, m.mtime)
      java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum spaces
      h(156) = '0' // typeflag: regular file
      writeStr(h, 257, "ustar")
      h(262) = 0
      writeStr(h, 263, "00") // version
      var sum = 0
      var i = 0
      while (i < 512) { sum += h(i) & 0xff; i += 1 }
      val cs = java.lang.Long.toOctalString(sum.toLong)
      val csp = ("0" * (6 - cs.length)) + cs
      for (k <- 0 until 6) h(148 + k) = csp.charAt(k).toByte
      h(154) = 0
      h(155) = ' '
      out.write(h, 0, 512)
      out.write(m.content, 0, m.content.length)
      val pad = (512 - m.content.length % 512) % 512
      out.write(new Array[Byte](pad), 0, pad)
    }
    out.write(new Array[Byte](1024), 0, 1024) // end-of-archive
    out.toByteArray
  }

  private def readOctal(h: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = off
    val end = off + len
    // skip leading spaces, stop at NUL/space terminator
    while (i < end && h(i) == ' ') i += 1
    while (i < end && h(i) != 0 && h(i) != ' ') {
      val c = h(i) - '0'
      require(c >= 0 && c <= 7, "TAR: malformed octal field")
      v = v * 8 + c
      i += 1
    }
    v
  }

  def decode(bytes: Array[Byte]): Seq[Member] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Member]
    var pos = 0
    var done = false
    while (!done) {
      require(pos + 512 <= bytes.length, "TAR: truncated header block")
      if ((0 until 512).forall(i => bytes(pos + i) == 0)) done = true
      else {
        val h = java.util.Arrays.copyOfRange(bytes, pos, pos + 512)
        require(new String(h, 257, 5, "US-ASCII") == "ustar",
          "TAR: missing ustar magic")
        // checksum: byte sum with the checksum field as spaces
        var sum = 0
        for (i <- 0 until 512)
          sum += (if (i >= 148 && i < 156) ' '.toInt else h(i) & 0xff)
        require(readOctal(h, 148, 8) == sum.toLong,
          "TAR: header checksum mismatch")
        val nameEnd = h.indexOf(0.toByte)
        val name = new String(h, 0, math.min(if (nameEnd < 0) 100
          else nameEnd, 100), "US-ASCII")
        val size = readOctal(h, 124, 12)
        val mtime = readOctal(h, 136, 12)
        val tf = h(156)
        require(tf == '0' || tf == 0,
          s"TAR: member type '${tf.toChar}' unsupported " +
            "(regular files only)")
        pos += 512
        require(pos + size <= bytes.length, "TAR: truncated member")
        val content = java.util.Arrays.copyOfRange(bytes, pos,
          pos + size.toInt)
        pos += size.toInt
        pos += ((512 - size % 512) % 512).toInt
        out += Member(name, size, mtime, content)
      }
    }
    out.toSeq
  }
}
