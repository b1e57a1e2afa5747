package graft.ext

/** TFRecord framing + protobuf wire-format parsing — the ML-dataset
  * ingest path (TFRecord streams of proto messages are how training
  * corpora actually ship), implemented from the two public specs:
  *
  * TFRecord (the TensorFlow record format):
  *  - `[length u64 LE][masked-crc32c(length) u32 LE][data]
  *    [masked-crc32c(data) u32 LE]` per record;
  *  - CRC-32C (Castagnoli, `java.util.zip.CRC32C`) with the format's
  *    mask `rotr15(crc) + 0xa282ead8` — BOTH checksums verified on
  *    every record, so bit rot fails by name mid-stream.
  *
  * Protobuf wire format (the public encoding spec):
  *  - tags as varints `(field << 3) | wireType`; wire types 0
  *    (varint), 1 (64-bit), 2 (length-delimited), 5 (32-bit);
  *  - UNKNOWN fields are skipped by their wire type (the protobuf
  *    compatibility contract), known fields decoded: here the
  *    3-field message `(msg_id: int64 = 1, text: bytes = 2,
  *    score: double = 3)`.
  *
  * Scale shape: record walks are O(bytes) per blob behind the
  * [[Multimodal]] seam; TFRecord's length-prefixed framing makes the
  * stream splittable by resync exactly like production readers. */
object TfRecord {

  private def maskedCrc(b: Array[Byte], from: Int, len: Int): Long = {
    val c = new java.util.zip.CRC32C()
    c.update(b, from, len)
    val crc = c.getValue & 0xffffffffL
    val rot = ((crc >>> 15) | (crc << 17)) & 0xffffffffL
    (rot + 0xa282ead8L) & 0xffffffffL
  }

  private def le(out: java.io.ByteArrayOutputStream, v: Long,
                 bytes: Int): Unit = {
    var i = 0
    while (i < bytes) { out.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
  }

  private def rdLe(b: Array[Byte], p: Int, n: Int): Long = {
    var v = 0L
    var i = n - 1
    while (i >= 0) { v = (v << 8) | (b(p + i) & 0xffL); i -= 1 }
    v
  }

  def encode(records: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { r =>
      val lenBytes = new java.io.ByteArrayOutputStream()
      le(lenBytes, r.length.toLong, 8)
      val lb = lenBytes.toByteArray
      out.write(lb, 0, 8)
      le(out, maskedCrc(lb, 0, 8), 4)
      out.write(r, 0, r.length)
      le(out, maskedCrc(r, 0, r.length), 4)
    }
    out.toByteArray
  }

  def decode(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var pos = 0
    while (pos < bytes.length) {
      require(pos + 12 <= bytes.length, "TFRecord: truncated header")
      val len = rdLe(bytes, pos, 8)
      require(rdLe(bytes, pos + 8, 4) == maskedCrc(bytes, pos, 8),
        "TFRecord: length CRC mismatch")
      pos += 12
      require(pos + len + 4 <= bytes.length,
        "TFRecord: truncated record data")
      val data = java.util.Arrays.copyOfRange(bytes, pos,
        pos + len.toInt)
      pos += len.toInt
      require(rdLe(bytes, pos, 4) ==
        maskedCrc(data, 0, data.length),
        "TFRecord: data CRC mismatch")
      pos += 4
      out += data
    }
    out.toSeq
  }

  // --------------------------------------------- protobuf wire layer
  final case class Msg(msg_id: Long, text: String, score: Double)

  private def writeVarint(out: java.io.ByteArrayOutputStream,
                          v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7
    }
    out.write(v.toInt)
  }

  def encodeMsg(m: Msg): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    writeVarint(out, (1L << 3) | 0) // field 1, varint
    writeVarint(out, m.msg_id)
    writeVarint(out, (2L << 3) | 2) // field 2, length-delimited
    val t = m.text.getBytes("UTF-8")
    writeVarint(out, t.length.toLong)
    out.write(t, 0, t.length)
    writeVarint(out, (3L << 3) | 1) // field 3, 64-bit
    le(out, java.lang.Double.doubleToLongBits(m.score), 8)
    out.toByteArray
  }

  def decodeMsg(bytes: Array[Byte]): Msg = {
    var pos = 0
    def varint(): Long = {
      var shift = 0
      var acc = 0L
      var b = 0x80
      while ((b & 0x80) != 0) {
        require(pos < bytes.length, "proto: truncated varint")
        require(shift <= 63, "proto: varint too long")
        b = bytes(pos) & 0xff
        pos += 1
        acc |= (b & 0x7fL) << shift
        shift += 7
      }
      acc
    }
    var id = 0L
    var text = ""
    var score = 0.0
    while (pos < bytes.length) {
      val tag = varint()
      val field = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      (field, wire) match {
        case (1, 0) => id = varint()
        case (2, 2) =>
          val n = varint().toInt
          require(pos + n <= bytes.length, "proto: truncated bytes")
          text = new String(bytes, pos, n, "UTF-8")
          pos += n
        case (3, 1) =>
          require(pos + 8 <= bytes.length, "proto: truncated fixed64")
          score = java.lang.Double.longBitsToDouble(rdLe(bytes, pos, 8))
          pos += 8
        case (_, 0) => varint() // unknown varint field: skip
        case (_, 2) =>
          val n = varint().toInt
          require(pos + n <= bytes.length, "proto: truncated skip")
          pos += n
        case (_, 1) => pos += 8
        case (_, 5) => pos += 4
        case (_, w) => throw new IllegalArgumentException(
          s"proto: wire type $w unsupported")
      }
    }
    Msg(id, text, score)
  }
}
