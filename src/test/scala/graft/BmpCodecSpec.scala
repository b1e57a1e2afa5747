package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.BmpCodec

/** Unit contract of the pure-JVM BMP codec (`e71_bmp_codec_rows` gates
  * it end-to-end through Spark + the DuckDB oracle; this pins the
  * byte-level invariants directly, including the decode-only top-down
  * path the encoder never emits). */
class BmpCodecSpec extends AnyFunSuite {

  private def px(w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h)(i => (i * 2654435761L % 0x1000000).toInt)

  test("encode→decode round-trips every stride-pad width") {
    // w = 16..19 gives w*3 mod 4 = 0,3,2,1 — all four pad values
    for (w <- 16 to 19; h <- Seq(1, 2, 9)) {
      val p = px(w, h)
      val (dw, dh, dp) = BmpCodec.decodeRgb24(BmpCodec.encodeRgb24(w, h, p))
      assert((dw, dh) == (w, h), s"${w}x$h dims")
      assert(dp.sameElements(p), s"${w}x$h pixels")
    }
  }

  test("top-down (negative height) input decodes to the same image") {
    val (w, h) = (17, 3) // pad 3
    val p = px(w, h)
    val bottomUp = BmpCodec.encodeRgb24(w, h, p)
    // rewrite biHeight to -h and flip the stored row order: the
    // bottom-up encoding stores row h-1 first, a top-down variant
    // stores row 0 first — same logical image
    val stride = (w * 3 + 3) / 4 * 4
    val topDown = bottomUp.clone()
    val bb = java.nio.ByteBuffer.wrap(topDown)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22, -h)
    for (row <- 0 until h; i <- 0 until stride)
      topDown(54 + row * stride + i) =
        bottomUp(54 + (h - 1 - row) * stride + i)
    val (dw, dh, dp) = BmpCodec.decodeRgb24(topDown)
    assert((dw, dh) == (w, h))
    assert(dp.sameElements(p))
  }

  test("malformed input fails fast naming the invariant") {
    val good = BmpCodec.encodeRgb24(16, 2, px(16, 2))
    def corrupt(mut: Array[Byte] => Unit): Array[Byte] = {
      val b = good.clone(); mut(b); b
    }
    assert(intercept[IllegalArgumentException](
      BmpCodec.decodeRgb24(good.take(40))).getMessage.contains("54"))
    assert(intercept[IllegalArgumentException](BmpCodec.decodeRgb24(
      corrupt(_(0) = 'X'.toByte))).getMessage.contains("magic"))
    assert(intercept[IllegalArgumentException](BmpCodec.decodeRgb24(
      corrupt(_(28) = 8.toByte))).getMessage.contains("bpp"))
    assert(intercept[IllegalArgumentException](BmpCodec.decodeRgb24(
      corrupt(_(30) = 1.toByte))).getMessage.contains("compression"))
    // declared pixel data overrunning the blob
    assert(intercept[IllegalArgumentException](BmpCodec.decodeRgb24(
      good.dropRight(4))).getMessage.contains("outside"))
  }
}
