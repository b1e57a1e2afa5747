package graft.ext

/** AAC ADTS (ISO 13818-7 / 14496-3 audio transport) frame scanner —
  * the second audio-inventory operator next to [[Mp3Scan]]: ADTS is
  * the framing web AAC ships in, and unlike MP3 its frame LENGTH is
  * an explicit 13-bit header field (including the header itself), so
  * the walk validates the field rather than deriving it from bitrate
  * tables. Implemented from the public spec:
  *
  *  - the 12-bit 0xFFF syncword, MPEG-version bit, layer (00 only),
  *    and protection-absent bit (CRC-less 7-byte headers only —
  *    9-byte CRC headers rejected by name);
  *  - profile (AudioObjectType − 1), the sampling-frequency-index
  *    table (96000..7350, index 13+ reserved), channel configuration;
  *  - the 13-bit aac_frame_length walk, the 11-bit buffer-fullness
  *    field (0x7FF = VBR marker), and
  *    number_of_raw_data_blocks_in_frame (each block = 1024 samples,
  *    so duration sums blocks, not frames).
  *
  * Scale shape: partition-local byte-blob function behind the
  * [[Multimodal]] codec seam — no shuffle until the per-doc rows.
  */
object AacScan {

  private val SampleRates = Array(96000, 88200, 64000, 48000, 44100,
    32000, 24000, 22050, 16000, 12000, 11025, 8000, 7350)

  final case class AacInfo(n_frames: Long, sample_rate: Long,
                           channels: Long, n_blocks: Long,
                           duration_ms: Long, min_frame_len: Long,
                           max_frame_len: Long, vbr: Long,
                           total_bytes: Long)

  def scan(bytes: Array[Byte]): AacInfo = {
    var pos = 0
    var n = 0L
    var blocks = 0L
    var rate = -1
    var chans = -1
    var minLen = Long.MaxValue
    var maxLen = 0L
    var vbr = 0L
    while (pos < bytes.length) {
      require(pos + 7 <= bytes.length, "AAC: truncated ADTS header")
      val b1 = bytes(pos) & 0xff
      val b2 = bytes(pos + 1) & 0xff
      require(b1 == 0xff && (b2 & 0xf0) == 0xf0, "AAC: lost ADTS sync")
      require((b2 & 0x06) == 0, "AAC: nonzero layer bits")
      require((b2 & 0x01) == 1,
        "AAC: CRC-protected ADTS headers unsupported (7-byte only)")
      val b3 = bytes(pos + 2) & 0xff
      val sfi = (b3 >> 2) & 0xf
      require(sfi < SampleRates.length,
        s"AAC: reserved sampling-frequency index $sfi")
      val r = SampleRates(sfi)
      require(rate == -1 || rate == r,
        "AAC: mixed sampling rates in one stream")
      rate = r
      val b4 = bytes(pos + 3) & 0xff
      val ch = ((b3 & 1) << 2) | (b4 >> 6)
      require(ch >= 1 && ch <= 2,
        s"AAC: channel configuration $ch unsupported (mono/stereo)")
      require(chans == -1 || chans == ch,
        "AAC: mixed channel configurations")
      chans = ch
      val b5 = bytes(pos + 4) & 0xff
      val b6 = bytes(pos + 5) & 0xff
      val b7 = bytes(pos + 6) & 0xff
      val frameLen = ((b4 & 3) << 11) | (b5 << 3) | (b6 >> 5)
      require(frameLen >= 7, s"AAC: frame length $frameLen < header")
      require(pos + frameLen <= bytes.length, "AAC: truncated frame")
      val fullness = ((b6 & 0x1f) << 6) | (b7 >> 2)
      if (fullness == 0x7ff) vbr = 1L
      val rdb = b7 & 3
      blocks += rdb + 1
      pos += frameLen
      n += 1
      if (frameLen < minLen) minLen = frameLen
      if (frameLen > maxLen) maxLen = frameLen
    }
    require(n > 0, "AAC: no frames")
    AacInfo(n, rate, chans, blocks, blocks * 1024L * 1000L / rate,
      minLen, maxLen, vbr, bytes.length.toLong)
  }
}
