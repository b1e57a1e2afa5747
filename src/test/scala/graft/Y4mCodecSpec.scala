package graft

import java.nio.charset.StandardCharsets.US_ASCII

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Y4mCodec
import graft.ext.Y4mCodec.Frame

/** Unit contract of the pure-JVM Y4M codec (`e78_y4m_codec_frames`
  * gates it end-to-end through Spark + the DuckDB oracle; this pins
  * the byte-level invariants directly, including header variants the
  * encoder never emits). */
class Y4mCodecSpec extends AnyFunSuite {

  private def frame(w: Int, h: Int, seed: Int): Frame = Frame(
    Array.tabulate(w * h)(i => ((i * 31 + seed * 7) % 256).toByte),
    Array.tabulate(w / 2 * (h / 2))(i => ((i * 13 + seed) % 256).toByte),
    Array.tabulate(w / 2 * (h / 2))(i => ((i * 17 + seed) % 256).toByte))

  private def assertSame(a: Frame, b: Frame): Unit = {
    assert(a.y.sameElements(b.y), "luma")
    assert(a.cb.sameElements(b.cb), "cb")
    assert(a.cr.sameElements(b.cr), "cr")
  }

  test("encode→decode round-trips dims, frame count, and every plane") {
    for (w <- Seq(2, 16, 30); h <- Seq(2, 8, 14); n <- Seq(1, 3)) {
      val fs = (0 until n).map(frame(w, h, _))
      val (dw, dh, dfs) = Y4mCodec.decode420(Y4mCodec.encode420(w, h, fs))
      assert((dw, dh, dfs.size) == (w, h, n), s"${w}x$h x$n")
      fs.zip(dfs).foreach { case (a, b) => assertSame(a, b) }
    }
  }

  test("header variants the spec permits decode: C absent (420 " +
    "default), C420jpeg, FRAME with parameters, extra X comment") {
    val f = frame(4, 2, 1)
    val base = Y4mCodec.encode420(4, 2, Seq(f))
    val s = new String(base, US_ASCII)
    def re(hdr: String, marker: String = "FRAME"): Array[Byte] = {
      val body = base.drop(s.indexOf('\n') + 1).drop("FRAME\n".length)
      (hdr + "\n" + marker + "\n").getBytes(US_ASCII) ++ body
    }
    for (v <- Seq(
        re("YUV4MPEG2 W4 H2"),
        re("YUV4MPEG2 W4 H2 F30000:1001 C420jpeg"),
        re("YUV4MPEG2 W4 H2 Xsome_comment C420mpeg2"),
        re("YUV4MPEG2 W4 H2", "FRAME Xinterlaced"))) {
      val (dw, dh, dfs) = Y4mCodec.decode420(v)
      assert((dw, dh, dfs.size) == (4, 2, 1))
      assertSame(f, dfs.head)
    }
  }

  test("zero frames is a valid (empty) stream") {
    val (w, h, fs) = Y4mCodec.decode420(Y4mCodec.encode420(6, 4, Nil))
    assert((w, h, fs.size) == (6, 4, 0))
  }

  test("malformed input fails fast naming the invariant") {
    val good = Y4mCodec.encode420(4, 2, Seq(frame(4, 2, 0)))
    def hdr(s: String): Array[Byte] =
      (s + "\n").getBytes(US_ASCII) ++
        good.drop(new String(good, US_ASCII).indexOf('\n') + 1)
    assert(intercept[IllegalArgumentException](Y4mCodec.decode420(
      hdr("NOTY4M W4 H2"))).getMessage.contains("magic"))
    assert(intercept[IllegalArgumentException](Y4mCodec.decode420(
      hdr("YUV4MPEG2 H2"))).getMessage.contains("W/H"))
    assert(intercept[IllegalArgumentException](Y4mCodec.decode420(
      hdr("YUV4MPEG2 W5 H2"))).getMessage.contains("even"))
    assert(intercept[IllegalArgumentException](Y4mCodec.decode420(
      hdr("YUV4MPEG2 W4 H2 C422"))).getMessage.contains("C422"))
    assert(intercept[IllegalArgumentException](Y4mCodec.decode420(
      hdr("YUV4MPEG2 W4 H2 Zbogus"))).getMessage.contains("unknown"))
    assert(intercept[IllegalArgumentException](Y4mCodec.decode420(
      hdr("YUV4MPEG2 Wx H2"))).getMessage.contains("non-numeric"))
    // truncated mid-frame: drop the last chroma byte
    assert(intercept[IllegalArgumentException](Y4mCodec.decode420(
      good.dropRight(1))).getMessage.contains("truncated"))
    // garbage instead of a FRAME marker
    val noMarker = {
      val nl = new String(good, US_ASCII).indexOf('\n')
      good.take(nl + 1) ++ "BOGUS\n".getBytes(US_ASCII) ++
        good.drop(nl + 1 + "FRAME\n".length)
    }
    assert(intercept[IllegalArgumentException](Y4mCodec.decode420(
      noMarker)).getMessage.contains("frame marker"))
    // no header terminator at all
    assert(intercept[IllegalArgumentException](Y4mCodec.decode420(
      "YUV4MPEG2 W4 H2".getBytes(US_ASCII)))
      .getMessage.contains("terminator"))
    // encoder-side guards
    assert(intercept[IllegalArgumentException](
      Y4mCodec.encode420(5, 2, Nil)).getMessage.contains("even"))
    assert(intercept[IllegalArgumentException](
      Y4mCodec.encode420(4, 2, Seq(frame(6, 2, 0))))
      .getMessage.contains("luma"))
  }
}
