package graft.ext

/** From-spec Avro OBJECT CONTAINER codec (the public Apache Avro 1.x
  * specification) for the fixed three-field record shape
  * `(rec_id: long, score: double, tag: string)` — the data-lake
  * interchange format gate: this container (not parquet) is what
  * upstream CDC/Kafka pipelines hand a 100 TB ingest, and Spark's
  * own Avro DataSource is an external module, so the seam is real.
  * Implemented completely from the spec, no Avro libraries:
  *
  *  - the `Obj\1` magic, the file-metadata map (terminated block
  *    form), the embedded JSON schema — the READER decodes by the
  *    schema's field ORDER, so any permutation of the three fields
  *    roundtrips; unknown fields or types fail by name;
  *  - `avro.codec` null and DEFLATE (raw deflate per the spec,
  *    `java.util.zip` with nowrap);
  *  - the 16-byte sync marker verified after EVERY block;
  *  - binary encoding: zigzag varint longs, little-endian IEEE
  *    doubles, length-prefixed UTF-8 strings;
  *  - multi-block containers with per-block record counts.
  *
  * Scale shape: blob-level encode/decode behind the [[Multimodal]]
  * seam — each container decodes partition-locally; only the record
  * rows shuffle.
  */
object AvroBlob {

  final case class Rec(rec_id: Long, score: Double, tag: String)

  // ------------------------------------------------------- primitives
  private def writeVarLong(out: java.io.ByteArrayOutputStream,
                           v: Long): Unit = {
    var n = (v << 1) ^ (v >> 63) // zigzag
    while ((n & ~0x7fL) != 0) {
      out.write(((n & 0x7f) | 0x80).toInt)
      n >>>= 7
    }
    out.write(n.toInt)
  }

  private final class Reader(val bytes: Array[Byte], var pos: Int) {
    def readVarLong(): Long = {
      var shift = 0
      var acc = 0L
      var b = 0x80
      while ((b & 0x80) != 0) {
        require(pos < bytes.length, "Avro: truncated varint")
        require(shift <= 63, "Avro: varint too long")
        b = bytes(pos) & 0xff
        pos += 1
        acc |= (b & 0x7fL) << shift
        shift += 7
      }
      (acc >>> 1) ^ -(acc & 1L) // un-zigzag
    }
    def readN(n: Int): Array[Byte] = {
      require(pos + n <= bytes.length, "Avro: truncated stream")
      val out = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
      pos += n
      out
    }
  }

  private def writeString(out: java.io.ByteArrayOutputStream,
                          s: String): Unit = {
    val b = s.getBytes("UTF-8")
    writeVarLong(out, b.length.toLong)
    out.write(b, 0, b.length)
  }

  private def writeDouble(out: java.io.ByteArrayOutputStream,
                          d: Double): Unit = {
    var bits = java.lang.Double.doubleToLongBits(d)
    var i = 0
    while (i < 8) { out.write((bits & 0xff).toInt); bits >>>= 8; i += 1 }
  }

  private val SchemaJson =
    """{"type":"record","name":"doc","fields":[""" +
      """{"name":"rec_id","type":"long"},""" +
      """{"name":"score","type":"double"},""" +
      """{"name":"tag","type":"string"}]}"""

  // ----------------------------------------------------------- encode
  /** One container: metadata map (schema + codec), deterministic
    * sync marker, records split into `blocks` data blocks. */
  def encode(recs: Seq[Rec], deflate: Boolean, syncSeed: Long,
             blocks: Int = 2): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write('O'); out.write('b'); out.write('j'); out.write(1)
    // metadata map: one block of n entries, then the 0 terminator
    val entries = Seq(
      "avro.schema" -> SchemaJson,
      "avro.codec" -> (if (deflate) "deflate" else "null"))
    writeVarLong(out, entries.length.toLong)
    entries.foreach { case (k, v) =>
      writeString(out, k)
      val vb = v.getBytes("UTF-8")
      writeVarLong(out, vb.length.toLong)
      out.write(vb, 0, vb.length)
    }
    writeVarLong(out, 0L)
    val sync = Array.tabulate[Byte](16)(i =>
      ((syncSeed * 31 + i * 17 + 5) % 256).toByte)
    out.write(sync, 0, 16)
    val perBlock = math.max(1, (recs.length + blocks - 1) /
      math.max(1, blocks))
    recs.grouped(perBlock).foreach { group =>
      val body = new java.io.ByteArrayOutputStream()
      group.foreach { r =>
        writeVarLong(body, r.rec_id)
        writeDouble(body, r.score)
        writeString(body, r.tag)
      }
      val payload =
        if (deflate) {
          val d = new java.util.zip.Deflater(
            java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
          d.setInput(body.toByteArray)
          d.finish()
          val buf = new Array[Byte](body.size() + 64)
          val bo = new java.io.ByteArrayOutputStream()
          while (!d.finished()) {
            val n = d.deflate(buf)
            bo.write(buf, 0, n)
          }
          d.end()
          bo.toByteArray
        } else body.toByteArray
      writeVarLong(out, group.length.toLong)
      writeVarLong(out, payload.length.toLong)
      out.write(payload, 0, payload.length)
      out.write(sync, 0, 16)
    }
    out.toByteArray
  }

  // ----------------------------------------------------------- decode
  /** Field (name, type) pairs in schema order, minimally parsed from
    * the embedded record schema JSON. */
  private def schemaFields(json: String): Seq[(String, String)] = {
    val m = java.util.regex.Pattern.compile(
      """\{"name":"(\w+)","type":"(\w+)"\}""").matcher(json)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    while (m.find()) out += ((m.group(1), m.group(2)))
    out.toSeq
  }

  def decode(bytes: Array[Byte]): Seq[Rec] = {
    val r = new Reader(bytes, 0)
    require(bytes.length >= 4 && bytes(0) == 'O' && bytes(1) == 'b' &&
      bytes(2) == 'j' && bytes(3) == 1, "Avro: bad container magic")
    r.pos = 4
    var codec = "null"
    var fields: Seq[(String, String)] = Seq.empty
    var n = r.readVarLong()
    while (n != 0L) {
      val cnt = if (n < 0) { r.readVarLong(); -n } else n
      var i = 0L
      while (i < cnt) {
        val klen = r.readVarLong().toInt
        val key = new String(r.readN(klen), "UTF-8")
        val vlen = r.readVarLong().toInt
        val v = new String(r.readN(vlen), "UTF-8")
        if (key == "avro.codec") codec = v
        else if (key == "avro.schema") fields = schemaFields(v)
        i += 1
      }
      n = r.readVarLong()
    }
    require(codec == "null" || codec == "deflate",
      s"Avro: codec '$codec' unsupported (null/deflate)")
    require(fields.map(_._1).sorted == Seq("rec_id", "score", "tag") &&
      fields.toMap == Map("rec_id" -> "long", "score" -> "double",
        "tag" -> "string"),
      s"Avro: schema fields $fields do not match the doc record")
    val sync = r.readN(16)
    val recs = scala.collection.mutable.ArrayBuffer.empty[Rec]
    while (r.pos < bytes.length) {
      val count = r.readVarLong()
      val size = r.readVarLong().toInt
      val raw = r.readN(size)
      val payload =
        if (codec == "deflate") {
          val inf = new java.util.zip.Inflater(true)
          inf.setInput(raw)
          val bo = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](4096)
          while (!inf.finished()) {
            val k = inf.inflate(buf)
            require(k > 0 || inf.finished(),
              "Avro: truncated deflate block")
            bo.write(buf, 0, k)
          }
          inf.end()
          bo.toByteArray
        } else raw
      val br = new Reader(payload, 0)
      var i = 0L
      while (i < count) {
        var id = 0L
        var score = 0.0
        var tag = ""
        fields.foreach {
          case ("rec_id", _) => id = br.readVarLong()
          case ("score", _) =>
            var bits = 0L
            val b = br.readN(8)
            var j = 7
            while (j >= 0) { bits = (bits << 8) | (b(j) & 0xffL); j -= 1 }
            score = java.lang.Double.longBitsToDouble(bits)
          case ("tag", _) =>
            tag = new String(br.readN(br.readVarLong().toInt), "UTF-8")
        }
        recs += Rec(id, score, tag)
        i += 1
      }
      require(br.pos == payload.length,
        "Avro: block payload has trailing bytes")
      require(java.util.Arrays.equals(r.readN(16), sync),
        "Avro: sync marker mismatch")
    }
    recs.toSeq
  }
}
