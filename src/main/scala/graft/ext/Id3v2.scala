package graft.ext

/** ID3v2.3 TEXT-FRAME extraction (the public id3.org spec) — the
  * metadata half of audio-corpus inventory: titles/artists/albums
  * feed dedup keys, attribution filters, and catalog joins, and they
  * live in the tag [[Mp3Scan]] only skips. Implemented from the
  * spec:
  *
  *  - the 10-byte tag header (`ID3`, version, flags, 4×7-bit
  *    syncsafe size); unsynchronisation/extended-header flags are
  *    rejected by name (they re-shape frame payloads);
  *  - 10-byte frame headers: 4-char ID, PLAIN big-endian 32-bit size
  *    (v2.3 frame sizes are NOT syncsafe — a classic implementation
  *    trap), 2 flag bytes (compression/encryption rejected by name);
  *  - `T***` text frames with encoding byte 0 (ISO-8859-1); UTF-16
  *    (encoding 1) is rejected by name, not mis-decoded;
  *  - zero-byte padding terminates the walk, as the spec prescribes.
  *
  * Scale shape: partition-local blob parsing behind the
  * [[Multimodal]] seam; one metadata row per frame crosses the
  * exchange.
  */
object Id3v2 {

  /** (frame_id, text) for every text frame in the leading ID3v2.3
    * tag; empty if the blob carries no tag. Non-text frames are
    * skipped by their declared size. */
  def textFrames(bytes: Array[Byte]): Seq[(String, String)] = {
    if (bytes.length < 10 || bytes(0) != 'I' || bytes(1) != 'D' ||
      bytes(2) != '3') return Seq.empty
    require((bytes(3) & 0xff) == 3,
      s"ID3v2: version 2.${bytes(3) & 0xff} unsupported (v2.3 only)")
    require((bytes(5) & 0xff) == 0,
      "ID3v2: unsynchronisation/extended-header flags unsupported")
    val size = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
      ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
    val end = 10 + size
    require(end <= bytes.length, "ID3v2: tag size exceeds stream")
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var pos = 10
    var done = false
    while (!done && pos + 10 <= end) {
      if (bytes(pos) == 0) done = true // padding
      else {
        val id = new String(bytes, pos, 4, "ISO-8859-1")
        require(id.forall(c => c.isUpper || c.isDigit),
          s"ID3v2: malformed frame id '$id'")
        // v2.3 frame size is plain big-endian, NOT syncsafe
        val fsize = ((bytes(pos + 4) & 0xff) << 24) |
          ((bytes(pos + 5) & 0xff) << 16) |
          ((bytes(pos + 6) & 0xff) << 8) | (bytes(pos + 7) & 0xff)
        require((bytes(pos + 9) & 0xc0) == 0,
          "ID3v2: compressed/encrypted frames unsupported")
        // A plain-BE size with the top bit set wraps negative in an Int;
        // without this guard a corrupt non-text frame passes the bounds
        // check below and the walk stops advancing (infinite loop).
        require(fsize >= 1, "ID3v2: non-positive frame size")
        require(pos + 10 + fsize <= end, "ID3v2: truncated frame")
        if (id.startsWith("T")) {
          require(fsize >= 1, "ID3v2: empty text frame")
          val enc = bytes(pos + 10) & 0xff
          require(enc == 0,
            s"ID3v2: text encoding $enc unsupported (ISO-8859-1 only)")
          var len = fsize - 1
          // optional trailing NUL
          if (len > 0 && bytes(pos + 10 + fsize - 1) == 0) len -= 1
          out += ((id, new String(bytes, pos + 11, len, "ISO-8859-1")))
        }
        pos += 10 + fsize
      }
    }
    out.toSeq
  }
}
