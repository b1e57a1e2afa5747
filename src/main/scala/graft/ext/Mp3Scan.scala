package graft.ext

/** MP3 (MPEG-1 Audio Layer III, ISO 11172-3) FRAME-HEADER scanner —
  * the audio-corpus INVENTORY operator: what a 100 TB curation
  * pipeline computes over raw .mp3 blobs WITHOUT decoding audio.
  * Full Layer III synthesis (hybrid filterbank/IMDCT) is float
  * arithmetic and deliberately out of scope for this repo's
  * hash-exact oracle contract; the frame STRUCTURE is exact integer
  * arithmetic and is implemented completely from the public spec:
  *
  *  - ID3v2 tag skip (the `ID3` magic + 4-byte syncsafe length);
  *  - the 32-bit frame header: 11-bit sync, version ID (MPEG-1
  *    only), layer (III only), protection bit, the Layer-III
  *    bitrate-index table (32..320 kbps; index 0 "free" and 15
  *    rejected by name), the sampling-rate table (44100/48000/32000;
  *    index 3 reserved), and the padding bit;
  *  - the Layer-III frame-length rule
  *    `144 · bitrate / samplerate + padding` used to WALK the stream
  *    frame by frame (payload bytes are never inspected, so false
  *    syncs inside payloads cannot derail the scan — the spec-correct
  *    walk, unlike naive sync-searching);
  *  - per-stream aggregates: frame count, padded-frame count,
  *    min/max bitrate (CBR = equal), duration from the fixed 1152
  *    samples/frame, and total byte length re-validated against the
  *    walk (a truncated final frame fails by name).
  *
  * Scale shape: partition-local byte-blob function behind the
  * [[Multimodal]] codec seam — no shuffle until the per-doc rows.
  */
object Mp3Scan {

  /** Layer III, MPEG-1 bitrate table (index 1..14, kbps). */
  private val BitrateKbps = Array(
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** MPEG-1 sampling-rate table (index 0..2). */
  private val SampleRate = Array(44100, 48000, 32000)

  final case class Mp3Info(n_frames: Long, sample_rate: Long,
                           n_padded: Long, min_kbps: Long,
                           max_kbps: Long, cbr: Long,
                           duration_ms: Long, total_bytes: Long)

  /** Scan one MP3 stream; requires every frame to be MPEG-1 Layer
    * III at a single sampling rate and the final frame complete. */
  def scan(bytes: Array[Byte]): Mp3Info = {
    var pos = 0
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
      bytes(2) == '3') {
      val size = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      pos = 10 + size
      require(pos <= bytes.length, "MP3: ID3v2 size exceeds stream")
    }
    var n = 0L
    var padded = 0L
    var minK = Long.MaxValue
    var maxK = 0L
    var rate = -1
    while (pos < bytes.length) {
      require(pos + 4 <= bytes.length, "MP3: truncated frame header")
      val h = ((bytes(pos) & 0xff) << 24) | ((bytes(pos + 1) & 0xff) << 16) |
        ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
      require((h >>> 21) == 0x7ff, "MP3: lost frame sync")
      require(((h >> 19) & 3) == 3,
        "MP3: only MPEG-1 streams supported (version ID 0b11)")
      require(((h >> 17) & 3) == 1,
        "MP3: only Layer III supported (layer bits 0b01)")
      val bidx = (h >> 12) & 0xf
      require(bidx >= 1 && bidx <= 14,
        s"MP3: bitrate index $bidx unsupported (free/bad)")
      val ridx = (h >> 10) & 3
      require(ridx != 3, "MP3: reserved sampling-rate index")
      val pad = (h >> 9) & 1
      val r = SampleRate(ridx)
      require(rate == -1 || rate == r,
        "MP3: mixed sampling rates in one stream")
      rate = r
      val k = BitrateKbps(bidx)
      val frameLen = 144000 * k / r + pad
      require(pos + frameLen <= bytes.length, "MP3: truncated frame")
      pos += frameLen
      n += 1
      padded += pad
      if (k < minK) minK = k
      if (k > maxK) maxK = k
    }
    require(n > 0, "MP3: no frames")
    Mp3Info(n, rate, padded, minK, maxK,
      if (minK == maxK) 1L else 0L,
      n * 1152L * 1000L / rate, bytes.length.toLong)
  }
}
