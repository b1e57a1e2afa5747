package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.WavCodec

/** The pure-JVM PCM WAV codec (VERDICT r8 #6): encode/decode identity,
  * RIFF chunk-walking robustness (unknown chunks, pad bytes), and
  * fail-fast rejection of malformed or unsupported input. The
  * end-to-end Spark path is oracle-gated by `e65_wav_codec_frames`;
  * this suite pins the byte-level contract. */
class WavCodecSpec extends AnyFunSuite {

  private val signal: Array[Int] =
    Array(0, 1, -1, 32767, -32768, 12345, -12345, 255, -256, 7)

  test("encode → decode is the identity on full-range PCM16") {
    assert(WavCodec.decodePcm16(WavCodec.encodePcm16(signal))
      .sameElements(signal))
    assert(WavCodec.decodePcm16(WavCodec.encodePcm16(Array.empty[Int]))
      .isEmpty)
  }

  test("decoder walks chunks: an unknown LIST chunk (odd-sized, " +
    "padded) before data is skipped, not misparsed") {
    val canonical = WavCodec.encodePcm16(signal)
    // splice an odd-length junk chunk between fmt (ends at 36) and data
    val junk = "JUNKODD".getBytes(US_ASCII) // 7 bytes -> 1 pad byte
    val bb = ByteBuffer
      .allocate(canonical.length + 8 + junk.length + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put(canonical, 0, 36)
    bb.put("LIST".getBytes(US_ASCII)).putInt(junk.length)
    bb.put(junk).put(0.toByte) // RIFF word-alignment pad
    bb.put(canonical, 36, canonical.length - 36)
    val spliced = bb.array()
    // keep the RIFF size field honest about the extra chunk
    ByteBuffer.wrap(spliced).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(4, spliced.length - 8)
    assert(WavCodec.decodePcm16(spliced).sameElements(signal))
  }

  test("malformed input fails fast with a named invariant") {
    def msg(bytes: Array[Byte]): String =
      intercept[IllegalArgumentException] {
        WavCodec.decodePcm16(bytes)
      }.getMessage
    assert(msg(Array[Byte](1, 2, 3)).contains("RIFF"))
    assert(msg("NOPE1234WAVE".getBytes(US_ASCII)).contains("RIFF"))
    assert(msg("RIFF0000ABCD".getBytes(US_ASCII)).contains("WAVE"))
    // truncated data chunk: declared size overruns the buffer
    val truncated = WavCodec.encodePcm16(signal).dropRight(4)
    assert(msg(truncated).contains("overrun") ||
      msg(truncated).contains("remain"))
    // stereo is rejected, not silently mixed down
    val stereo = WavCodec.encodePcm16(signal)
    ByteBuffer.wrap(stereo).order(ByteOrder.LITTLE_ENDIAN)
      .putShort(22, 2.toShort) // channels field
    assert(msg(stereo).contains("channels"))
  }
}
