package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Id3v2

/** ID3v2.3 text-frame extraction: hand-built tags, the plain
  * (non-syncsafe) v2.3 frame-size trap, skip-by-size for non-text
  * frames, by-name rejections. */
class Id3v2Spec extends AnyFunSuite {

  private def tag(frames: Array[Byte], pad: Int): Array[Byte] = {
    val ts = frames.length + pad
    "ID3".getBytes("ISO-8859-1") ++ Array[Byte](3, 0, 0,
      ((ts >> 21) & 0x7f).toByte, ((ts >> 14) & 0x7f).toByte,
      ((ts >> 7) & 0x7f).toByte, (ts & 0x7f).toByte) ++
      frames ++ Array.fill[Byte](pad)(0)
  }

  private def textFrame(id: String, text: String): Array[Byte] = {
    val fsize = 1 + text.length
    id.getBytes("ISO-8859-1") ++ Array[Byte](
      ((fsize >> 24) & 0xff).toByte, ((fsize >> 16) & 0xff).toByte,
      ((fsize >> 8) & 0xff).toByte, (fsize & 0xff).toByte, 0, 0,
      0) ++ text.getBytes("ISO-8859-1")
  }

  test("text frames extract in order; a 200-byte PRIV frame is " +
    "skipped by its PLAIN big-endian size (a syncsafe misread would " +
    "derail the walk); padding terminates; no tag → empty") {
    // 200 = 0b11001000 — syncsafe misread would compute 0b1001000=72
    val priv = "PRIV".getBytes("ISO-8859-1") ++
      Array[Byte](0, 0, 0, 200.toByte, 0, 0) ++
      Array.fill[Byte](200)(0x55)
    val frames = textFrame("TIT2", "Hello") ++ priv ++
      textFrame("TPE1", "World")
    val got = Id3v2.textFrames(tag(frames, pad = 30) ++
      Array[Byte](1, 2, 3))
    assert(got == Seq("TIT2" -> "Hello", "TPE1" -> "World"))
    assert(Id3v2.textFrames("no tag here".getBytes("ISO-8859-1"))
      .isEmpty)
    // trailing NUL is stripped
    val nul = textFrame("TALB", "Abc\u0000")
    assert(Id3v2.textFrames(tag(nul, 0)) == Seq("TALB" -> "Abc"))
  }

  test("by-name rejection: UTF-16 encoding, v2.4 tags, compressed " +
    "frames, truncated frames") {
    def expectMsg(bytes: Array[Byte], word: String): Unit = {
      val msg = intercept[IllegalArgumentException](
        Id3v2.textFrames(bytes)).getMessage
      assert(msg.toLowerCase.contains(word.toLowerCase), msg)
    }
    val utf16 = textFrame("TIT2", "xx").clone()
    utf16(10) = 1 // encoding byte
    expectMsg(tag(utf16, 0), "encoding")
    val v24 = tag(textFrame("TIT2", "x"), 0).clone()
    v24(3) = 4
    expectMsg(v24, "version")
    val comp = textFrame("TIT2", "x").clone()
    comp(9) = 0x80.toByte // frame flags: compression
    expectMsg(tag(comp, 0), "compressed")
    // frame size pointing past the tag end
    val overrun = textFrame("TIT2", "x").clone()
    overrun(7) = 100
    expectMsg(tag(overrun, 0), "truncated")
  }

  test("top-bit frame size on a NON-text frame fails by name instead " +
    "of looping forever (ADVICE r14)") {
    // plain-BE size 0x80000000 wraps negative in an Int; before the
    // guard, `pos + 10 + fsize <= end` passed and the walk stopped
    // advancing — an executor hang, not an error. Non-text id (PRIV)
    // so the old text-frame-only size check never ran.
    val neg = "PRIV".getBytes("ISO-8859-1") ++
      Array[Byte](0x80.toByte, 0, 0, 0, 0, 0) ++ Array[Byte](1, 2)
    val msg = intercept[IllegalArgumentException](
      Id3v2.textFrames(tag(neg, 0))).getMessage
    assert(msg.contains("non-positive frame size"), msg)
    // a literal zero size on a non-text frame is the same trap
    // (pos += 10 forever over the same header is fine, but spec-wise
    // a zero-size frame is malformed — reject it too)
    val zero = "PRIV".getBytes("ISO-8859-1") ++
      Array[Byte](0, 0, 0, 0, 0, 0)
    val msg2 = intercept[IllegalArgumentException](
      Id3v2.textFrames(tag(zero, 0))).getMessage
    assert(msg2.contains("non-positive frame size"), msg2)
  }
}
