package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY §7 E-ops): treat image/audio/video
  * payloads as opaque `binary` columns with typed metadata, and run
  * decode/feature-extraction as partition-local batch functions.
  *
  * The Spark-side plumbing — schema, batching, partitioning, feature
  * extraction over fixed-size frames — is real and tested. Two codecs
  * sit behind the partition-local seam:
  *
  *  - [[decodeWavFrames]]: a REAL pure-JVM PCM WAV decoder
  *    ([[WavCodec]], VERDICT r8 #6) — RIFF chunk walk + PCM16 parse,
  *    oracle-gated end-to-end via `e65_wav_codec_frames`;
  *  - [[decodeBmpRows]]: a REAL pure-JVM BMP image decoder
  *    ([[BmpCodec]], r10) — header walk + 24-bit BI_RGB with stride
  *    padding and both row orders, oracle-gated end-to-end via
  *    `e71_bmp_codec_rows`;
  *  - [[decodeY4mFrames]]: a REAL pure-JVM Y4M video decoder
  *    ([[Y4mCodec]], r11 — audio/image/video all real now) —
  *    YUV4MPEG2 header walk + planar 4:2:0 frame stride, oracle-gated
  *    end-to-end via `e78_y4m_codec_frames`;
  *  - [[decodeJpegPlaneRows]]: a REAL pure-JVM baseline-JPEG decoder
  *    ([[JpegCodec]], r13 — the entropy-coded LOSSY format web
  *    corpora actually ship): Huffman scan decode + dequant + IDCT +
  *    4:2:0 MCU reassembly, oracle-gated end-to-end via
  *    `e174_jpeg_codec_rows` and ImageIO-cross-checked in spec;
  *  - [[decodeH264Rows]] / [[decodeH264FrameRows]]: a REAL pure-JVM
  *    H.264/AVC decoder ([[H264Codec]], r14): Annex B NAL walk with
  *    emulation prevention, Exp-Golomb headers, I_PCM, DC-predicted
  *    I_16x16 with CAVLC DC residuals, I_4x4 V/H/DC prediction, and
  *    INTERFRAME P slices with sub-pel motion compensation —
  *    oracle-gated via `e197`/`e198`/`e210`/`e211`/`e217`/`e218`;
  *  - [[scanMp3Rows]] / [[scanAacRows]] / [[extractId3Rows]]: the
  *    audio-inventory layer (frame-structure walks + metadata) for
  *    the lossy formats whose sample decode is float-transform-based
  *    and therefore outside the hash-exact oracle contract;
  *  - [[decodeFrames]]: the deterministic generic STUB retained as
  *    the seam shape for any format with no pure-JVM codec.
  *
  * All use the same mapPartitions topology (iterator → iterator, codec
  * state initialized once per partition, never per row) — the shape a
  * JNI codec or external model-server client plugs into.
  */
object Multimodal {

  val FrameBytes = 64

  /** Wrap documents as multimodal rows: payload = UTF-8 bytes standing in
    * for an encoded media blob, plus a typed metadata struct. */
  def asBlobTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        col("n_chars").as("n_chars"),
        col("lang").as("lang"),
        col("source").as("source")).as("meta"))

  /** Declarative per-blob features: byte length, frame count at
    * [[FrameBytes]] granularity, and the byte length of the middle frame
    * (a frame-sampling stand-in). Pure Column expressions → codegen. */
  def frameFeatures(blobs: DataFrame): DataFrame = {
    val fb = FrameBytes
    val byteLen = length(col("payload"))
    val nFrames = ceil(byteLen.cast("double") / fb).cast("long")
    blobs.select(
      col("doc_id"),
      byteLen.cast("long").as("byte_len"),
      nFrames.as("n_frames"),
      length(expr(s"substring(payload, " +
        s"cast(((cast(ceil(length(payload) / cast($fb as double)) as long)" +
        s" - 1) div 2) * $fb + 1 as int), $fb)")).cast("long")
        .as("mid_frame_len"),
      col("meta.mime").as("mime"),
      col("meta.lang").as("lang"))
  }

  /** The decoded-frame record a real codec would produce. */
  case class DecodedFrame(doc_id: Long, frame_idx: Int, n_bytes: Int,
                          checksum: Long)

  /** STUB decode: deterministic fake standing in for an image/audio
    * decoder. Real implementation would decode `payload` into pixel/PCM
    * frames; the fake chunks bytes into [[FrameBytes]]-sized frames and
    * emits a per-frame additive checksum as the "feature". The
    * mapPartitions shape (iterator → iterator, codec init once per
    * partition) is exactly what a real codec integration needs.
    */
  /** Deterministic synthetic PCM — the closed-form signal both the
    * engine (via encode→decode) and the DuckDB oracle (directly)
    * compute, making the codec hash-gateable:
    * sample i of doc d = ((d·31 + i·7) mod 65536) − 32768, doc length
    * 300 + (d mod 200) samples. */
  def synthSample(id: Long, i: Int): Int =
    (((id * 31 + i * 7) % 65536) - 32768).toInt

  def synthLen(id: Long): Int = (300 + id % 200).toInt

  /** Synthetic WAV blob table: one encoded mono PCM16 WAV payload per
    * doc_id, carrying the [[synthSample]] signal. The encode runs
    * partition-local (same seam shape as the decoders). */
  def syntheticWav(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          (id, WavCodec.encodePcm16(
            Array.tabulate(synthLen(id))(i => synthSample(id, i))))
        }
      }.toDF("doc_id", "payload")
  }

  /** One decoded audio frame: fixed sample-count window with
    * integer-exact features (hash-gateable — no accumulation-order
    * float drift). */
  case class AudioFrame(doc_id: Long, frame_idx: Long, n_samples: Long,
                        sum_abs: Long, peak: Long, first_s: Long,
                        last_s: Long)

  /** Two-tone amplitudes for the SPECTRAL gate (e194). The signal is
    * s_i = a1·cos(πi/2) + a2·cos(πi) — the two frequencies (N/4 and
    * Nyquist at frame size N=256) whose cosines take only values in
    * {−1, 0, 1}, so the PCM16 samples are EXACTLY the formula (no
    * rounding) and the frame spectrum is closed-form: P[64] =
    * (a1·128)², P[128] = (a2·256)², every other bin 0. a1 is forced
    * odd and the bin-128 magnitude is 2·a2·128 (even), so the dominant
    * bin never ties and flips per doc as the amplitudes race. */
  def toneAmps(id: Long): (Int, Int) =
    ((2 * (id % 350) + 201).toInt, (100 + id % 250).toInt)

  /** Spectral frame length (power of two, radix-2 FFT). */
  val SpectrumFrame = 256

  def synthToneLen(id: Long): Int = SpectrumFrame * (1 + id % 3).toInt

  def synthToneSample(id: Long, i: Int): Int = {
    val (a1, a2) = toneAmps(id)
    val c4 = (i % 4) match {
      case 0 => 1; case 2 => -1; case _ => 0
    }
    val c2 = if (i % 2 == 0) 1 else -1
    a1 * c4 + a2 * c2
  }

  /** Synthetic WAV blobs carrying the exact two-tone signal. */
  def syntheticWavTone(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          (id, WavCodec.encodePcm16(
            Array.tabulate(synthToneLen(id))(i =>
              synthToneSample(id, i))))
        }
      }.toDF("doc_id", "payload")
  }

  /** One spectral-analysis frame: the spectrogram-column stats an
    * audio curation pass keeps per window. Discrete features
    * (dominant/rolloff BIN indices) are FP-noise-immune by orders of
    * magnitude on the gate signal; the two continuous ones (centroid,
    * log10 power) carry relative FFT error ~1e-15 ≪ the round-6
    * oracle margin. */
  case class AudioSpectrumFrame(doc_id: Long, frame_idx: Long,
                                n_samples: Long, dominant_bin: Long,
                                centroid: Double, rolloff_bin: Long,
                                log_power: Double)

  /** Decode each WAV payload and emit per-frame SPECTRAL features via
    * the from-scratch radix-2 [[Fft]] — the frequency-domain stage
    * after the codec (e181's ZCR/energy are time-domain). Dominant =
    * argmax power bin (lowest on ties), centroid = Σk·P/ΣP, rolloff =
    * smallest bin whose cumulative power reaches 85% of the total,
    * log_power = log₁₀ΣP. Same partition-local iterator→iterator
    * topology as [[decodeWavFrames]]: decode and FFT never shuffle;
    * only (frames × 7 columns) rows cross the exchange. */
  def decodeWavSpectrum(blobs: DataFrame,
                        frameSamples: Int = SpectrumFrame)
      : Dataset[AudioSpectrumFrame] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val samples = WavCodec.decodePcm16(payload)
          require(samples.length % frameSamples == 0,
            s"doc $id: ${samples.length} samples not a whole number " +
              s"of $frameSamples-sample spectral frames")
          samples.grouped(frameSamples).zipWithIndex.map {
            case (fr, idx) =>
              val p = Fft.powerSpectrum(fr)
              var total = 0.0
              var weighted = 0.0
              var domBin = 0
              var domP = p(0)
              var k = 0
              while (k < p.length) {
                total += p(k)
                weighted += k.toDouble * p(k)
                if (p(k) > domP) { domP = p(k); domBin = k }
                k += 1
              }
              var cum = 0.0
              var roll = p.length - 1
              var found = false
              k = 0
              while (k < p.length && !found) {
                cum += p(k)
                if (cum >= 0.85 * total) { roll = k; found = true }
                k += 1
              }
              AudioSpectrumFrame(id, idx.toLong, fr.length.toLong,
                domBin.toLong, weighted / total, roll.toLong,
                math.log10(total))
          }
        }
      }
  }

  /** Fast-wrapping sawtooth for the audio-FEATURE gate (e181): step
    * 7919 wraps every ~8 samples, so zero crossings actually occur —
    * the e65 signal (step 7) is monotone within every doc length and
    * would make the crossing count vacuously zero. */
  def synthOscSample(id: Long, i: Int): Int =
    (((id * 31 + i.toLong * 7919) % 65536) - 32768).toInt

  /** Synthetic WAV blobs carrying the oscillating signal. */
  def syntheticWavOsc(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          (id, WavCodec.encodePcm16(
            Array.tabulate(synthLen(id))(i => synthOscSample(id, i))))
        }
      }.toDF("doc_id", "payload")
  }

  /** One analysis frame of DSP-style integer features: zero-crossing
    * count (sign flips between in-frame neighbors — the classic
    * voiced/unvoiced + noisiness screen), energy as the exact Σs²
    * (≤ 2³⁸ per 256-sample frame — no float RMS needed for the gate),
    * and |peak|. */
  case class AudioZcrFrame(doc_id: Long, frame_idx: Long,
                           n_samples: Long, n_zero_cross: Long,
                           sum_sq: Long, peak: Long)

  /** Decode each WAV payload and emit per-frame ZCR/energy features —
    * the feature-EXTRACTION stage after the codec (what an audio
    * curation pass actually computes), same partition-local
    * iterator→iterator topology as [[decodeWavFrames]]. */
  def decodeWavZcrEnergy(blobs: DataFrame,
                         frameSamples: Int = 256): Dataset[AudioZcrFrame] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val samples = WavCodec.decodePcm16(payload)
          samples.grouped(frameSamples).zipWithIndex.map {
            case (fr, idx) =>
              var zc = 0L; var sq = 0L; var pk = 0L
              var i = 0
              while (i < fr.length) {
                val s = fr(i)
                if (i > 0 && ((fr(i - 1) < 0) != (s < 0))) zc += 1
                sq += s.toLong * s.toLong
                val a = math.abs(s.toLong)
                if (a > pk) pk = a
                i += 1
              }
              AudioZcrFrame(id, idx.toLong, fr.length.toLong, zc, sq, pk)
          }
        }
      }
  }

  /** REAL codec path: decode each payload with [[WavCodec]] and emit
    * per-frame features over `frameSamples`-sized windows. The decoder
    * initializes per partition (here: stateless, but the seam is the
    * same); malformed payloads fail the task — a curation pipeline
    * filters/quarantines them upstream rather than letting a codec
    * guess. */
  def decodeWavFrames(blobs: DataFrame,
                      frameSamples: Int = 256): Dataset[AudioFrame] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val samples = WavCodec.decodePcm16(payload)
          samples.grouped(frameSamples).zipWithIndex.map {
            case (fr, idx) =>
              AudioFrame(id, idx.toLong, fr.length.toLong,
                fr.foldLeft(0L)((a, s) => a + math.abs(s)),
                fr.map(s => math.abs(s).toLong).max,
                fr.head.toLong, fr.last.toLong)
          }
        }
      }
  }

  /** Deterministic synthetic RGB pixel — the closed-form image both the
    * engine (via BMP encode→decode) and the DuckDB oracle (directly)
    * compute, making the image codec hash-gateable:
    * px(d, x, y) = (r,g,b) with r = (d·7 + 3x + 5y) mod 256,
    * g = (d·11 + x + 2y) mod 256, b = (d·13 + 4x + y) mod 256. */
  def synthPx(id: Long, x: Int, y: Int): Int = {
    val r = ((id * 7 + x * 3 + y * 5) % 256).toInt
    val g = ((id * 11 + x + y * 2) % 256).toInt
    val b = ((id * 13 + x * 4 + y) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  /** Width 16..32: `w·3 mod 4` cycles through every stride-pad value,
    * so a padding bug in [[BmpCodec]] cannot survive the gate. */
  def synthImgW(id: Long): Int = (16 + id % 17).toInt
  def synthImgH(id: Long): Int = (8 + id % 9).toInt

  /** Synthetic BMP blob table: one encoded 24-bit image payload per
    * doc_id carrying the [[synthPx]] pattern. Encode runs
    * partition-local — the same seam shape as the decoders. */
  def syntheticBmp(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = synthImgW(id); val h = synthImgH(id)
          (id, BmpCodec.encodeRgb24(w, h,
            Array.tabulate(w * h)(i => synthPx(id, i % w, i / w))))
        }
      }.toDF("doc_id", "payload")
  }

  /** One decoded image row: integer-exact per-scanline features
    * (hash-gateable — no float accumulation). `max_lum` is integer
    * BT.601 luma (299r+587g+114b)/1000. */
  case class ImageRow(doc_id: Long, y: Long, n_px: Long, sum_r: Long,
                      sum_g: Long, sum_b: Long, max_lum: Long,
                      first_px: Long, last_px: Long)

  /** Per-scanline [[ImageRow]] features of a decoded pixel array —
    * shared by every image-codec gate so BMP and PNG are compared
    * against the SAME oracle. */
  private def imageRows(id: Long, w: Int, h: Int,
                        px: Array[Int]): Iterator[ImageRow] =
    (0 until h).iterator.map { y =>
      var sr = 0L; var sg = 0L; var sb = 0L; var ml = 0L
      var x = 0
      while (x < w) {
        val p = px(y * w + x)
        val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff
        val b = p & 0xff
        sr += r; sg += g; sb += b
        val lum = (299L * r + 587L * g + 114L * b) / 1000L
        if (lum > ml) ml = lum
        x += 1
      }
      ImageRow(id, y.toLong, w.toLong, sr, sg, sb, ml,
        (px(y * w) & 0xffffff).toLong,
        (px(y * w + w - 1) & 0xffffff).toLong)
    }

  /** REAL image-codec path: decode each payload with [[BmpCodec]] and
    * emit per-scanline features — the image twin of
    * [[decodeWavFrames]], same iterator→iterator partition-local
    * topology, same fail-fast contract on malformed payloads. */
  def decodeBmpRows(blobs: DataFrame): Dataset[ImageRow] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val (w, h, px) = BmpCodec.decodeRgb24(payload)
          imageRows(id, w, h, px)
        }
      }
  }

  /** Synthetic PNG blob table: the [[synthPx]] pattern (same dims and
    * pixels as the BMP gate) encoded through the zlib path with the
    * per-row filter cycle — so e116 shares e71's oracle verbatim:
    * same expected pixels, different codec under test. */
  def syntheticPng(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = synthImgW(id); val h = synthImgH(id)
          (id, PngCodec.encodeRgb24(w, h,
            Array.tabulate(w * h)(i => synthPx(id, i % w, i / w))))
        }
      }.toDF("doc_id", "payload")
  }

  /** Nearest-neighbor resize of a top-down row-major pixel array —
    * the thumbnail/normalization step between decode and
    * feature-extract: out(x,y) = in(⌊x·sw/ow⌋, ⌊y·sh/oh⌋). Pure
    * integer index math, so the resampled image is EXACTLY computable
    * from the source formula and the resize gate stays hash-exact
    * (bilinear would be the quality upgrade; its blend weights are
    * rational with denominator ow·oh, so an integer fixed-point form
    * stays oracle-able too — nearest is the gate's floor). */
  def resizeNearest(w: Int, h: Int, px: Array[Int],
                    ow: Int, oh: Int): Array[Int] =
    Array.tabulate(ow * oh) { i =>
      val x = i % ow; val y = i / ow
      px((y * h / oh) * w + (x * w / ow))
    }

  /** Decode each BMP payload, nearest-resize to `ow`×`oh`, emit the
    * standard per-scanline features — the decode→transform→extract
    * pipeline every multimodal curation pass runs, partition-local
    * end to end. */
  def decodeResizeRows(blobs: DataFrame, ow: Int,
                       oh: Int): Dataset[ImageRow] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val (w, h, px) = BmpCodec.decodeRgb24(payload)
          imageRows(id, ow, oh, resizeNearest(w, h, px, ow, oh))
        }
      }
  }

  /** REAL compressed-image-codec path: decode each PNG payload
    * (chunk walk, CRC verify, inflate, all five filter
    * reconstructions) and emit the same per-scanline features. */
  def decodePngRows(blobs: DataFrame): Dataset[ImageRow] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val (w, h, px) = PngCodec.decodeRgb24(payload)
          imageRows(id, w, h, px)
        }
      }
  }

  /** Deterministic synthetic 4:2:0 video — the closed-form planes both
    * the engine (via Y4M encode→decode) and the DuckDB oracle
    * (directly) compute, making the video codec hash-gateable:
    * Y(d,t,x,y) = (d·7 + t·11 + 3x + 5y) mod 256,
    * Cb(d,t,u,v) = (d·13 + 3t + 5u + 7v) mod 256,
    * Cr(d,t,u,v) = (d·17 + 5t + 7u + 3v) mod 256. */
  def synthY(id: Long, t: Int, x: Int, y: Int): Int =
    ((id * 7 + t * 11 + x * 3 + y * 5) % 256).toInt
  def synthCb(id: Long, t: Int, u: Int, v: Int): Int =
    ((id * 13 + t * 3 + u * 5 + v * 7) % 256).toInt
  def synthCr(id: Long, t: Int, u: Int, v: Int): Int =
    ((id * 17 + t * 5 + u * 7 + v * 3) % 256).toInt

  /** Even dims 16..32 × 8..16 and 2..4 frames, all varying per doc —
    * no single plane layout can mask a stride/offset bug in
    * [[Y4mCodec]]. */
  def synthVidW(id: Long): Int = (16 + 2 * (id % 9)).toInt
  def synthVidH(id: Long): Int = (8 + 2 * (id % 5)).toInt
  def synthVidFrames(id: Long): Int = (2 + id % 3).toInt

  /** Synthetic Y4M blob table: one encoded 4:2:0 video payload per
    * doc_id carrying the closed-form planes. Encode runs
    * partition-local — the same seam shape as the decoders. */
  def syntheticY4m(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = synthVidW(id); val h = synthVidH(id)
          val frames = (0 until synthVidFrames(id)).map { t =>
            Y4mCodec.Frame(
              Array.tabulate(w * h)(i =>
                synthY(id, t, i % w, i / w).toByte),
              Array.tabulate((w / 2) * (h / 2))(i =>
                synthCb(id, t, i % (w / 2), i / (w / 2)).toByte),
              Array.tabulate((w / 2) * (h / 2))(i =>
                synthCr(id, t, i % (w / 2), i / (w / 2)).toByte))
          }
          (id, Y4mCodec.encode420(w, h, frames))
        }
      }.toDF("doc_id", "payload")
  }

  /** One decoded video frame: integer-exact whole-plane features
    * (hash-gateable — no float accumulation). first_y/last_y are the
    * luma plane's corner samples — an offset bug's canary. */
  case class VideoFrame(doc_id: Long, frame_idx: Long, n_y: Long,
                        sum_y: Long, max_y: Long, sum_cb: Long,
                        sum_cr: Long, first_y: Long, last_y: Long)

  /** REAL video-codec path: decode each payload with [[Y4mCodec]] and
    * emit per-frame features — the video member of the codec triad
    * ([[decodeWavFrames]], [[decodeBmpRows]]): same iterator→iterator
    * partition-local topology, same fail-fast contract on malformed
    * payloads. */
  def decodeY4mFrames(blobs: DataFrame): Dataset[VideoFrame] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val (w, h, frames) = Y4mCodec.decode420(payload)
          frames.iterator.zipWithIndex.map { case (f, t) =>
            var sy = 0L; var my = 0L; var scb = 0L; var scr = 0L
            var i = 0
            while (i < f.y.length) {
              val v = f.y(i) & 0xff
              sy += v; if (v > my) my = v
              i += 1
            }
            i = 0
            while (i < f.cb.length) {
              scb += f.cb(i) & 0xff; scr += f.cr(i) & 0xff
              i += 1
            }
            VideoFrame(id, t.toLong, (w.toLong * h), sy, my, scb, scr,
              (f.y(0) & 0xff).toLong, (f.y(f.y.length - 1) & 0xff).toLong)
          }
        }
      }
  }

  /** Deterministic 8×8-BLOCK-CONSTANT YCbCr planes — the closed-form
    * pattern the JPEG gate (e174) encodes through the REAL lossy
    * pipeline and still roundtrips bit-exactly (see [[JpegCodec]]:
    * block-constant ⇒ DC-only; even luma divides q₀₀=16, chroma
    * 128+17m divides q₀₀=17 ⇒ quantization is lossless), so the
    * DuckDB oracle evaluates these formulas directly. */
  def jpegImgW(id: Long): Int = (16 * (1 + id % 3)).toInt
  def jpegImgH(id: Long): Int = (16 * (1 + id % 2)).toInt
  def jpegBlockY(id: Long, bx: Int, by: Int): Int =
    2 * (((id * 5 + 3 * bx + 7 * by) % 128).toInt)
  def jpegBlockCb(id: Long, bx: Int, by: Int): Int =
    128 + 17 * ((((id * 3 + bx + 2 * by) % 15).toInt) - 7)
  def jpegBlockCr(id: Long, bx: Int, by: Int): Int =
    128 + 17 * ((((id * 11 + 2 * bx + by) % 15).toInt) - 7)

  /** Synthetic JPEG blob table: one REAL baseline 4:2:0 JFIF payload
    * per doc_id (Huffman-coded through [[JpegCodec.encode420]])
    * carrying the block-constant pattern. Dims cycle 16/32/48 ×
    * 16/32 so multiple MCU grids are exercised. Partition-local —
    * the same seam shape as the decoders. */
  def syntheticJpeg(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = jpegImgW(id); val h = jpegImgH(id)
          val y = Array.tabulate(w * h)(i =>
            jpegBlockY(id, (i % w) / 8, (i / w) / 8))
          val cb = Array.tabulate(w / 2 * h / 2)(i =>
            jpegBlockCb(id, (i % (w / 2)) / 8, (i / (w / 2)) / 8))
          val cr = Array.tabulate(w / 2 * h / 2)(i =>
            jpegBlockCr(id, (i % (w / 2)) / 8, (i / (w / 2)) / 8))
          (id, JpegCodec.encode420(w, h, y, cb, cr))
        }
      }.toDF("doc_id", "payload")
  }

  /** The same block-constant pattern as [[syntheticJpeg]] encoded as
    * a PROGRESSIVE (SOF2) stream — DC first + refinement scans and
    * EOBn-run AC band scans — so e188 shares e174's oracle verbatim:
    * same expected planes, a different scan architecture under test. */
  def syntheticJpegProgressive(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = jpegImgW(id); val h = jpegImgH(id)
          val y = Array.tabulate(w * h)(i =>
            jpegBlockY(id, (i % w) / 8, (i / w) / 8))
          val cb = Array.tabulate(w / 2 * h / 2)(i =>
            jpegBlockCb(id, (i % (w / 2)) / 8, (i / (w / 2)) / 8))
          val cr = Array.tabulate(w / 2 * h / 2)(i =>
            jpegBlockCr(id, (i % (w / 2)) / 8, (i / (w / 2)) / 8))
          (id, JpegCodec.encode420Progressive(w, h, y, cb, cr))
        }
      }.toDF("doc_id", "payload")
  }

  /** 4:2:2 variant dims (h only needs MCU-height 8 alignment when
    * vs = 1) and blob table — exercises the decoder's generic
    * sampling walk on a geometry no other gate touches (chroma
    * half-width, FULL height). */
  def jpeg422ImgW(id: Long): Int = (16 * (1 + id % 3)).toInt
  def jpeg422ImgH(id: Long): Int = (8 * (1 + id % 2)).toInt

  def syntheticJpeg422(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = jpeg422ImgW(id); val h = jpeg422ImgH(id)
          val y = Array.tabulate(w * h)(i =>
            jpegBlockY(id, (i % w) / 8, (i / w) / 8))
          val cb = Array.tabulate(w / 2 * h)(i =>
            jpegBlockCb(id, (i % (w / 2)) / 8, (i / (w / 2)) / 8))
          val cr = Array.tabulate(w / 2 * h)(i =>
            jpegBlockCr(id, (i % (w / 2)) / 8, (i / (w / 2)) / 8))
          (id, JpegCodec.encodeSubsampled(w, h, y, cb, cr, 2, 1))
        }
      }.toDF("doc_id", "payload")
  }

  /** One decoded JPEG plane scanline: integer-exact features per
    * (doc, plane, row) — covers the luma AND both subsampled chroma
    * planes, so an MCU-layout or chroma-stride bug cannot hide. */
  case class PlaneRow(doc_id: Long, plane: String, y: Long, n_px: Long,
                      sum_v: Long, max_v: Long, first_v: Long,
                      last_v: Long)

  /** REAL compressed-image-codec path for JPEG: decode each payload
    * (marker walk, DHT Huffman, dequantize, IDCT, MCU reassembly)
    * with [[JpegCodec]] and emit per-plane scanline features — same
    * iterator→iterator partition-local topology and fail-fast
    * contract as the other codec gates. */
  def decodeJpegPlaneRows(blobs: DataFrame): Dataset[PlaneRow] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    val names = IndexedSeq("y", "cb", "cr")
    blobs.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val dec = JpegCodec.decodePlanes(payload)
          dec.planes.iterator.zipWithIndex.flatMap { case (p, pi) =>
            (0 until p.h).iterator.map { y =>
              var s = 0L; var mx = 0L
              var x = 0
              while (x < p.w) {
                val v = p.data(y * p.w + x)
                s += v; if (v > mx) mx = v
                x += 1
              }
              PlaneRow(id, names(pi), y.toLong, p.w.toLong, s, mx,
                p.data(y * p.w).toLong,
                p.data(y * p.w + p.w - 1).toLong)
            }
          }
        }
      }
  }

  /** JPEG decode all the way to PACKED RGB (replication chroma
    * upsample + JFIF BT.601) with the standard per-scanline features —
    * oracle-exact despite two different rounding conventions: Scala's
    * `math.round` (floor(x+½)) and SQL `round` (half away from zero)
    * differ ONLY at negative exact halves, and every such value
    * clamps to 0 on both engines; identical expression trees make the
    * pre-round doubles bit-identical, so post-clamp channels agree
    * everywhere. */
  def decodeJpegRgbRows(blobs: DataFrame): Dataset[ImageRow] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val (w, h, px) = JpegCodec.decodeRgb24(payload)
          imageRows(id, w, h, px)
        }
      }
  }

  /** JPEG decode → nearest-RESIZE → extract (the e117 composition on
    * the entropy-coded format): each decoded plane resizes
    * independently to its subsampling-scaled target (luma ow×oh,
    * chroma halves) — pure integer index math over the
    * lossless-roundtrip pattern, so the resampled features stay
    * oracle-exact. Partition-local end to end. */
  def decodeJpegResizeRows(blobs: DataFrame, ow: Int,
                           oh: Int): Dataset[PlaneRow] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    val names = IndexedSeq("y", "cb", "cr")
    blobs.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val dec = JpegCodec.decodePlanes(payload)
          dec.planes.iterator.zipWithIndex.flatMap { case (p, pi) =>
            val tw = if (pi == 0) ow else ow / 2
            val th = if (pi == 0) oh else oh / 2
            val rp = resizeNearest(p.w, p.h, p.data, tw, th)
            (0 until th).iterator.map { y =>
              var s = 0L; var mx = 0L
              var x = 0
              while (x < tw) {
                val v = rp(y * tw + x)
                s += v; if (v > mx) mx = v
                x += 1
              }
              PlaneRow(id, names(pi), y.toLong, tw.toLong, s, mx,
                rp(y * tw).toLong, rp(y * tw + tw - 1).toLong)
            }
          }
        }
      }
  }

  /** Documents as REAL gzip blobs — the form compressed text corpora
    * actually ship in (gzipped JSONL/WET files): each text gzips
    * through the JVM's DEFLATE (real RFC 1952 members, CRC32 +
    * ISIZE trailers verified on read), partition-local. */
  def syntheticGzip(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, t) =>
          val bos = new java.io.ByteArrayOutputStream()
          val gz = new java.util.zip.GZIPOutputStream(bos)
          gz.write(t.getBytes("UTF-8")); gz.close()
          (id, bos.toByteArray)
        }
      }.toDF("doc_id", "payload")
  }

  /** One decoded text blob: decoded length in CODEPOINTS (matching
    * SQL length() semantics) and the md5 fingerprint of the decoded
    * bytes — any inflate/trailer bug breaks the hash against the
    * uncompressed base table. */
  /** Synthetic FLAC blobs carrying the SAME oscillating signal as the
    * WAV gate (e181) — so the FLAC gate shares e181's oracle verbatim
    * (same expected features, different codec under test: the
    * e116/e71 PNG-vs-BMP precedent, now for compressed audio).
    * Per-doc variety exercises the whole subframe surface: FIXED
    * order 1 or 2 by doc parity, frame 0 forced VERBATIM every fifth
    * doc; CONSTANT is spec-covered (the osc signal never flattens). */
  def syntheticFlacOsc(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          (id, FlacCodec.encode(
            Array.tabulate(synthLen(id))(i => synthOscSample(id, i)),
            fixedOrder = (id % 2).toInt + 1,
            forceVerbatim = f => f == 0 && id % 5 == 0))
        }
      }.toDF("doc_id", "payload")
  }

  /** Synthetic FLAC blobs carrying the SAME oscillating signal as
    * e181/e204, coded with LPC SUBFRAMES — orders 2..5 by doc id,
    * Levinson-Durbin-chosen quantized coefficients, exact-integer
    * reconstruction on decode. Same expected features as e204; the
    * LPC decode path (warmup + precision/shift/coefficient fields +
    * 64-bit prediction sums) is what's under test. */
  def syntheticFlacLpc(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          (id, FlacCodec.encode(
            Array.tabulate(synthLen(id))(i => synthOscSample(id, i)),
            lpcOrder = 2 + (id % 4).toInt))
        }
      }.toDF("doc_id", "payload")
  }

  /** Decode each FLAC payload (CRC-8/CRC-16/MD5 verified) and emit
    * the SAME per-frame ZCR/energy features as the WAV path. */
  def decodeFlacZcrEnergy(blobs: DataFrame,
                          frameSamples: Int = 256)
      : Dataset[AudioZcrFrame] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val samples = FlacCodec.decode(payload)
          samples.grouped(frameSamples).zipWithIndex.map {
            case (fr, idx) =>
              var zc = 0L; var sq = 0L; var pk = 0L
              var i = 0
              while (i < fr.length) {
                val s = fr(i)
                if (i > 0 && ((fr(i - 1) < 0) != (s < 0))) zc += 1
                sq += s.toLong * s.toLong
                val a = math.abs(s.toLong)
                if (a > pk) pk = a
                i += 1
              }
              AudioZcrFrame(id, idx.toLong, fr.length.toLong, zc, sq, pk)
          }
        }
      }
  }

  /** Per-channel ZCR/energy frame (the stereo gate shape). */
  case class AudioZcrChFrame(doc_id: Long, channel: String,
                             frame_idx: Long, n_samples: Long,
                             n_zero_cross: Long, sum_sq: Long,
                             peak: Long)

  /** Synthetic STEREO FLAC blobs: left = the e181 oscillating signal,
    * right = a correlated derivation (truncating half + a small
    * sawtooth, so the SIDE channel is genuinely non-trivial);
    * mid/side and independent frames alternate by (frame + doc)
    * parity, exercising both decorrelation paths per stream. */
  def syntheticFlacStereo(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val n = synthLen(id)
          val l = Array.tabulate(n)(i => synthOscSample(id, i))
          val r = Array.tabulate(n)(i => l(i) / 2 - (i % 7))
          (id, FlacCodec.encodeStereo(l, r,
            fixedOrder = (id % 2).toInt + 1,
            midSide = f => (f + id) % 2 == 0))
        }
      }.toDF("doc_id", "payload")
  }

  /** Decode stereo FLAC payloads and emit the per-channel ZCR/energy
    * features (both channels through the full CRC/MD5-verified
    * decorrelation path). */
  def decodeFlacStereoZcr(blobs: DataFrame,
                          frameSamples: Int = 256)
      : Dataset[AudioZcrChFrame] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val (l, r) = FlacCodec.decodeStereo(payload)
          Iterator(("l", l), ("r", r)).flatMap { case (ch, samples) =>
            samples.grouped(frameSamples).zipWithIndex.map {
              case (fr, idx) =>
                var zc = 0L; var sq = 0L; var pk = 0L
                var i = 0
                while (i < fr.length) {
                  val s = fr(i)
                  if (i > 0 && ((fr(i - 1) < 0) != (s < 0))) zc += 1
                  sq += s.toLong * s.toLong
                  val a = math.abs(s.toLong)
                  if (a > pk) pk = a
                  i += 1
                }
                AudioZcrChFrame(id, ch, idx.toLong, fr.length.toLong,
                  zc, sq, pk)
            }
          }
        }
      }
  }

  /** One MFCC coefficient row. */
  case class MfccRow(doc_id: Long, frame_idx: Long, coef_idx: Long,
                     mfcc: Double)

  /** Decode each WAV payload and emit per-frame MFCCs (the e194
    * spectral path extended through the mel filterbank + DCT-II —
    * what speech/audio curation actually clusters on). 8 kHz sample
    * rate ⇒ 31.25 Hz bins, filterbank to the 4 kHz Nyquist. Same
    * partition-local topology as every codec seam. */
  def decodeWavMfcc(blobs: DataFrame,
                    frameSamples: Int = SpectrumFrame,
                    nFilters: Int = 20,
                    nCoefs: Int = 6): Dataset[MfccRow] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val samples = WavCodec.decodePcm16(payload)
          require(samples.length % frameSamples == 0,
            s"doc $id: ${samples.length} samples not a whole number " +
              s"of $frameSamples-sample frames")
          samples.grouped(frameSamples).zipWithIndex.flatMap {
            case (fr, idx) =>
              val cs = Fft.mfcc(Fft.powerSpectrum(fr),
                binHz = 8000.0 / frameSamples, fMax = 4000.0,
                nFilters = nFilters, nCoefs = nCoefs)
              cs.iterator.zipWithIndex.map { case (c, n) =>
                MfccRow(id, idx.toLong, n.toLong, c)
              }
          }
        }
      }
  }

  // ------------------------------------------------------ H.264 seam

  /** Per-pixel luma for the all-I_PCM H.264 gate (e197): wraps the
    * full byte range INCLUDING 0x00/0x01/0x02/0x03 runs, so the
    * Annex B emulation-prevention path is exercised by real content,
    * not by luck. */
  def synthH264Px(id: Long, x: Int, y: Int): Int =
    ((id * 31 + (y * 48 + x).toLong * 7) % 256).toInt

  /** Per-MB constant luma for the checkerboard gate (e198). */
  def synthH264MbVal(id: Long, mx: Int, my: Int): Int =
    (30 + (id * 7 + mx * 31 + my * 17) % 200).toInt

  val H264MbGrid = 3 // 3×3 MBs → 48×48 px per frame

  /** Synthetic all-I_PCM H.264 streams: every MB carries raw samples
    * of [[synthH264Px]] (the spec's lossless escape — arbitrary exact
    * content through a fully conformant bitstream). */
  def syntheticH264Pcm(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    val g = H264MbGrid
    ids.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val mbs = for (my <- 0 until g; mx <- 0 until g) yield
            H264Codec.PcmMb(Array.tabulate(256)(i =>
              synthH264Px(id, mx * 16 + i % 16, my * 16 + i / 16)))
          (id, H264Codec.encode(g, g, mbs))
        }
      }.toDF("doc_id", "payload")
  }

  /** Synthetic checkerboard H.264 streams: MBs at even (mx+my) are
    * constant-valued I_PCM, odd ones are DC-PREDICTED I_16x16 — the
    * decoder must run real cross-MB intra prediction (left/top
    * 16-sample means with the spec's rounding) to reconstruct them. */
  def syntheticH264Checker(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    val g = H264MbGrid
    ids.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val mbs = for (my <- 0 until g; mx <- 0 until g) yield
            if ((mx + my) % 2 == 0)
              H264Codec.PcmMb(
                Array.fill(256)(synthH264MbVal(id, mx, my)))
            else (H264Codec.DcPredMb: H264Codec.Mb)
          (id, H264Codec.encode(g, g, mbs))
        }
      }.toDF("doc_id", "payload")
  }

  /** Quantized DC residual level for the CAVLC gate (e210): 0..699
    * spans zero blocks, trailing-one ±1 levels, 1-bit prefixes, and
    * both the prefix-14 and prefix-15 level escapes. */
  def synthH264DcLevel(id: Long, mx: Int, my: Int): Int =
    ((id * 13 + mx * 71 + my * 37) % 700).toInt

  /** Synthetic H.264 streams for the CAVLC DC-residual gate: row 0
    * anchors the prediction chain with constant I_PCM MBs; rows 1..2
    * are DC-predicted I_16x16 each carrying ONE quantized DC level —
    * the decoder must run real coeff_token/level/total_zeros parsing,
    * the inverse Hadamard, and the QP-26 dequant to reconstruct.
    * Row-1 MBs see I_PCM tops (nC ≥ 8, the FLC class); row-2 MBs see
    * I_16x16 neighbors (nC 0, the VLC class) — both tables
    * content-exercised. */
  def syntheticH264DcResidual(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    val g = H264MbGrid
    ids.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val mbs = for (my <- 0 until g; mx <- 0 until g) yield
            if (my == 0)
              (H264Codec.PcmMb(Array.fill(256)(
                synthH264MbVal(id, mx, 0))): H264Codec.Mb)
            else H264Codec.DcResidualMb(synthH264DcLevel(id, mx, my))
          (id, H264Codec.encode(g, g, mbs))
        }
      }.toDF("doc_id", "payload")
  }

  /** Synthetic H.264 streams for the I_4x4 gate: row 0 and column 0
    * are per-pixel I_PCM anchors (the e197 pattern); interior MBs
    * alternate uniform Vertical / Horizontal I_4x4 prediction — the
    * decoder copies actual varying neighbor rows/columns through the
    * per-4x4-block chain. */
  def syntheticH264I4x4(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    val g = H264MbGrid
    ids.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val mbs = for (my <- 0 until g; mx <- 0 until g) yield
            if (my == 0 || mx == 0)
              (H264Codec.PcmMb(Array.tabulate(256)(i =>
                synthH264Px(id, mx * 16 + i % 16,
                  my * 16 + i / 16))): H264Codec.Mb)
            else if ((mx + my) % 2 == 0) H264Codec.I4x4Mb.uniform(0)
            else H264Codec.I4x4Mb.uniform(1)
          (id, H264Codec.encode(g, g, mbs))
        }
      }.toDF("doc_id", "payload")
  }

  // -------------------------------------------------------- MP3 seam

  /** Synthetic MP3 streams for the frame-scan gate (e212): a quarter
    * of the docs carry an ID3v2 tag (syncsafe length), frames are
    * real MPEG-1 Layer III headers with per-frame bitrate indices
    * (every fifth doc CBR at 128 kbps, the rest VBR across the full
    * 32..320 table), alternating padding bits, and filler payloads
    * sized by the spec's 144·bitrate/rate + padding rule — payload
    * bytes freely contain false 0xFF syncs, which the length-walk
    * must ignore. */
  def syntheticMp3(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    val kbpsTab = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160,
      192, 224, 256, 320)
    val rateTab = Array(44100, 48000, 32000)
    ids.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
          if (id % 4 == 0) {
            val ts = (40 + id % 30).toInt
            buf ++= "ID3".getBytes("US-ASCII")
            buf += 3; buf += 0 // v2.3.0
            buf += 0 // flags
            buf += ((ts >> 21) & 0x7f).toByte
            buf += ((ts >> 14) & 0x7f).toByte
            buf += ((ts >> 7) & 0x7f).toByte
            buf += (ts & 0x7f).toByte
            for (j <- 0 until ts) buf += ((id + j * 11) % 256).toByte
          }
          val nf = (5 + id % 7).toInt
          val ridx = (id % 3).toInt
          val rate = rateTab(ridx)
          for (f <- 0 until nf) {
            val bidx =
              if (id % 5 == 0) 9
              else (1 + ((id * 3 + f) % 14)).toInt
            val pad = if ((id + f) % 3 == 0) 1 else 0
            val flen = 144000 * kbpsTab(bidx) / rate + pad
            buf += 0xff.toByte
            buf += 0xfb.toByte // sync tail + MPEG-1 + Layer III + no CRC
            buf += ((bidx << 4) | (ridx << 2) | (pad << 1)).toByte
            buf += 0xc0.toByte // mono
            for (j <- 4 until flen)
              buf += ((id + f * 7 + j) % 256).toByte
          }
          (id, buf.toArray)
        }
      }.toDF("doc_id", "payload")
  }

  /** Synthetic MP3 blobs with REAL ID3v2.3 tags (e215): four text
    * frames (TIT2/TPE1/TALB/TRCK, ISO-8859-1), one non-text frame
    * the extractor must skip by size, trailing padding, then two
    * audio frames. */
  def syntheticMp3Tagged(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val frames = scala.collection.mutable.ArrayBuffer.empty[Byte]
          def textFrame(fid: String, text: String): Unit = {
            frames ++= fid.getBytes("ISO-8859-1")
            val fsize = 1 + text.length
            frames += ((fsize >> 24) & 0xff).toByte
            frames += ((fsize >> 16) & 0xff).toByte
            frames += ((fsize >> 8) & 0xff).toByte
            frames += (fsize & 0xff).toByte
            frames += 0; frames += 0 // flags
            frames += 0 // encoding: ISO-8859-1
            frames ++= text.getBytes("ISO-8859-1")
          }
          textFrame("TIT2", s"Title ${id % 50}")
          textFrame("TPE1", s"Artist ${id % 20}")
          textFrame("TALB", s"Album ${id % 10}")
          textFrame("TRCK", s"${1 + id % 12}")
          // a non-text frame (private data) the walk must skip
          frames ++= "PRIV".getBytes("ISO-8859-1")
          val plen = (8 + id % 16).toInt
          frames += 0; frames += 0; frames += 0; frames += plen.toByte
          frames += 0; frames += 0
          for (j <- 0 until plen) frames += ((id + j) % 256).toByte
          val pad = (10 + id % 20).toInt
          val ts = frames.length + pad
          val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
          buf ++= "ID3".getBytes("ISO-8859-1")
          buf += 3; buf += 0; buf += 0
          buf += ((ts >> 21) & 0x7f).toByte
          buf += ((ts >> 14) & 0x7f).toByte
          buf += ((ts >> 7) & 0x7f).toByte
          buf += (ts & 0x7f).toByte
          buf ++= frames
          for (_ <- 0 until pad) buf += 0
          // two audio frames so the blob is a real MP3 stream
          val rate = 44100
          for (f <- 0 until 2) {
            val flen = 144000 * 128 / rate
            buf += 0xff.toByte; buf += 0xfb.toByte
            buf += ((9 << 4) | (0 << 2)).toByte; buf += 0xc0.toByte
            for (j <- 4 until flen) buf += ((id + f + j) % 256).toByte
          }
          (id, buf.toArray)
        }
      }.toDF("doc_id", "payload")
  }

  /** One extracted metadata row. */
  case class Id3Row(doc_id: Long, frame_id: String, text_value: String)

  /** Extract ID3v2.3 text frames from each payload with [[Id3v2]]. */
  def extractId3Rows(blobs: DataFrame): Dataset[Id3Row] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          Id3v2.textFrames(payload).map { case (fid, t) =>
            Id3Row(id, fid, t)
          }
        }
      }
  }

  /** Synthetic crawl HTML for the extraction gate (e216): title +
    * head script, body paragraphs of known lengths, a body script
    * whose code contains a bare '<' (the naive-stripper trap), and
    * anchor spans whose text lengths drive the link density. */
  /** The deterministic page generator shared by the HTML gate (e216,
    * seed = doc_id) and the WARC gate (e219, per-record seeds). */
  def synthHtmlFor(seed: Long): String = {
    val sb = new StringBuilder
    sb.append("<html><head><title>T").append(seed % 100)
      .append("</title><script>if(x<").append(seed)
      .append(")x=1;</script></head><body>")
    for (p <- 0 until (2 + seed % 3).toInt)
      sb.append("<p>").append("t" * (5 + (seed + p) % 7).toInt)
        .append("</p>")
    sb.append("<script>var q=").append(seed)
      .append(";if(q<9)q=0;</script>")
    for (l <- 0 until (1 + seed % 2).toInt)
      sb.append("<a href=\"u").append(l).append("\">")
        .append("L" * (2 + (seed + l) % 3).toInt).append("</a>")
    sb.append("</body></html>")
    sb.toString
  }

  def syntheticHtml(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map(id => (id, synthHtmlFor(id)))
      }.toDF("doc_id", "html")
  }

  /** Synthetic WARC blobs (e219): a warcinfo record, then 2..4 HTTP
    * response records — mostly 200 text/html pages from the shared
    * generator, every fourth a 404 text/plain. Bodies are framed by
    * Content-Length, so HTML freely containing CRLFs or 'WARC/'
    * strings cannot derail the walk. */
  def syntheticWarc(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val nr = (2 + id % 3).toInt
          var blob = Warc.record("warcinfo", "", "software: graft\r\n")
          for (rr <- 0 until nr) {
            val uri = s"http://ex.test/d$id/p$rr"
            blob = blob ++ (if ((id + rr) % 4 == 0)
              Warc.record("response", uri,
                Warc.httpResponse(404, "text/plain", s"not found $id"))
            else
              Warc.record("response", uri,
                Warc.httpResponse(200, "text/html",
                  synthHtmlFor(id * 7 + rr))))
          }
          (id, blob)
        }
      }.toDF("doc_id", "payload")
  }

  /** One WARC record row: record fields + HTML features when the
    * payload is an HTML response (the full crawl-ingest composition:
    * WARC walk → HTTP split → boilerplate extraction). */
  case class WarcRow(doc_id: Long, rec_idx: Long, warc_type: String,
                     target_uri: String, http_status: Long,
                     content_type: String, title: String,
                     n_links: Long, text_chars: Long,
                     link_chars: Long, link_density_pct: Long)

  def extractWarcRows(blobs: DataFrame): Dataset[WarcRow] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          Warc.parse(payload).zipWithIndex.map { case (rec, idx) =>
            if (rec.warc_type == "response" &&
              rec.content_type.startsWith("text/html")) {
              val d = HtmlExtract.extract(rec.body)
              WarcRow(id, idx.toLong, rec.warc_type, rec.target_uri,
                rec.http_status, rec.content_type, d.title,
                d.n_links, d.text_chars, d.link_chars,
                d.linkDensityPct)
            } else WarcRow(id, idx.toLong, rec.warc_type,
              rec.target_uri, rec.http_status, rec.content_type, "",
              0L, rec.body.length.toLong, 0L, 0L)
          }
        }
      }
  }

  /** Synthetic ustar archives (e220): 2..5 text members per doc with
    * formula-driven names, sizes, and mtimes. */
  def syntheticTar(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val members = (0 until (2 + id % 4).toInt).map { m =>
            val len = (20 + (id + m) % 50).toInt
            val ch = ('a' + (id + m) % 26).toChar
            TarBlob.Member(s"d$id/f$m.txt", len.toLong,
              1700000000L + id * 60 + m,
              Array.fill[Byte](len)(ch.toByte))
          }
          (id, TarBlob.encode(members))
        }
      }.toDF("doc_id", "payload")
  }

  /** One enumerated archive member. */
  case class TarRow(doc_id: Long, member_idx: Long, name: String,
                    size: Long, mtime: Long, first_char: String)

  def enumerateTarRows(blobs: DataFrame): Dataset[TarRow] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          TarBlob.decode(payload).zipWithIndex.map { case (m, i) =>
            TarRow(id, i.toLong, m.name, m.size, m.mtime,
              if (m.content.isEmpty) ""
              else new String(m.content, 0, 1, "US-ASCII"))
          }
        }
      }
  }

  /** Synthetic ZIP archives (e221): 2..5 members, alternating STORED
    * and DEFLATE, formula-driven names and repeated-character
    * contents (highly compressible, so the deflate path genuinely
    * shrinks and the recorded sizes diverge). */
  def syntheticZip(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val entries = (0 until (2 + id % 4).toInt).map { m =>
            val len = (30 + (id + m) % 70).toInt
            val ch = ('a' + (id * 3 + m) % 26).toChar
            ZipBlob.Entry(s"z$id/m$m.txt",
              Array.fill[Byte](len)(ch.toByte),
              deflate = (id + m) % 2 == 0)
          }
          (id, ZipBlob.encode(entries))
        }
      }.toDF("doc_id", "payload")
  }

  /** Synthetic .tar.gz blobs (e222): the e220 archive shape under a
    * gzip layer — the composition real dataset distribution uses. A
    * DIFFERENT member-formula seed keeps the two gates' oracles
    * independent. */
  def syntheticTarGz(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val members = (0 until (1 + id % 5).toInt).map { m =>
            val len = (15 + (id * 2 + m) % 40).toInt
            val ch = ('a' + (id + m * 5) % 26).toChar
            TarBlob.Member(s"g$id/t$m.txt", len.toLong,
              1710000000L + id + m,
              Array.fill[Byte](len)(ch.toByte))
          }
          val bo = new java.io.ByteArrayOutputStream()
          val gz = new java.util.zip.GZIPOutputStream(bo)
          val tar = TarBlob.encode(members)
          gz.write(tar, 0, tar.length)
          gz.close()
          (id, bo.toByteArray)
        }
      }.toDF("doc_id", "payload")
  }

  /** Inflate the gzip layer, then enumerate the tar. */
  def enumerateTarGzRows(blobs: DataFrame): Dataset[TarRow] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val gz = new java.util.zip.GZIPInputStream(
            new java.io.ByteArrayInputStream(payload))
          val tar = gz.readAllBytes()
          gz.close()
          TarBlob.decode(tar).zipWithIndex.map { case (m, i) =>
            TarRow(id, i.toLong, m.name, m.size, m.mtime,
              if (m.content.isEmpty) ""
              else new String(m.content, 0, 1, "US-ASCII"))
          }
        }
      }
  }

  /** Synthetic TFRecord streams of proto messages (e224): 2..5
    * records per doc with dyadic scores, an UNKNOWN varint field
    * (field 7) injected into every other message so the
    * skip-by-wire-type path is content-exercised. */
  def syntheticTfRecord(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val recs = (0 until (2 + id % 4).toInt).map { r =>
            val base = TfRecord.encodeMsg(TfRecord.Msg(
              id * 1000 + r,
              "m" * (3 + (id + r) % 6).toInt,
              (id % 50) * 0.5 + r * 0.25))
            if ((id + r) % 2 == 0) {
              // prepend an unknown field-7 varint the decoder skips
              val out = new java.io.ByteArrayOutputStream()
              out.write(((7 << 3) | 0)) // tag
              out.write(42)
              out.write(base, 0, base.length)
              out.toByteArray
            } else base
          }
          (id, TfRecord.encode(recs))
        }
      }.toDF("doc_id", "payload")
  }

  /** One decoded TFRecord proto row. */
  case class TfRow(doc_id: Long, rec_idx: Long, msg_id: Long,
                   text_len: Long, score: Double)

  def decodeTfRecordRows(blobs: DataFrame): Dataset[TfRow] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          TfRecord.decode(payload).zipWithIndex.map { case (r, i) =>
            val m = TfRecord.decodeMsg(r)
            TfRow(id, i.toLong, m.msg_id, m.text.length.toLong,
              m.score)
          }
        }
      }
  }

  /** One enumerated ZIP member (CRC-verified). */
  case class ZipRow(doc_id: Long, member_idx: Long, name: String,
                    size: Long, method: Long, first_char: String)

  def enumerateZipRows(blobs: DataFrame): Dataset[ZipRow] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          ZipBlob.decode(payload).zipWithIndex.map { case (m, i) =>
            ZipRow(id, i.toLong, m.name, m.size, m.method,
              if (m.content.isEmpty) ""
              else new String(m.content, 0, 1, "US-ASCII"))
          }
        }
      }
  }

  /** One extracted page row. */
  case class HtmlRow(doc_id: Long, title: String, n_links: Long,
                     text_chars: Long, link_chars: Long,
                     link_density_pct: Long)

  /** Extract each page with [[HtmlExtract]]. */
  def extractHtmlRows(pages: DataFrame): Dataset[HtmlRow] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.select(col("doc_id"), col("html"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, html) =>
          val d = HtmlExtract.extract(html)
          HtmlRow(id, d.title, d.n_links, d.text_chars, d.link_chars,
            d.linkDensityPct)
        }
      }
  }

  /** Synthetic MIXED audio corpus (e225): each doc carries ONE of
    * the four audio containers by id%4 — WAV and FLAC share the osc
    * signal, MP3/AAC reuse the e212/e213 frame synthesis — so the
    * dispatcher must actually sniff, not trust a column. */
  def syntheticAudioMixed(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    val wav = syntheticWavOsc(ids.filter(col("doc_id") % 4 === 0))
    val flac = ids.filter(col("doc_id") % 4 === 1)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, FlacCodec.encode(
        Array.tabulate(synthLen(id))(i => synthOscSample(id, i)),
        lpcOrder = 2))))
      .toDF("doc_id", "payload")
    val mp3 = syntheticMp3(ids.filter(col("doc_id") % 4 === 2))
    val aac = syntheticAac(ids.filter(col("doc_id") % 4 === 3))
    wav.unionByName(flac).unionByName(mp3).unionByName(aac)
  }

  /** One unified audio-inventory row: sniffed format, sample rate,
    * duration, and the per-format unit count (samples for decoded
    * containers, frames for the scanned lossy ones). */
  case class AudioInventoryRow(doc_id: Long, format: String,
                               sample_rate: Long, duration_ms: Long,
                               n_units: Long)

  /** Sniff each blob by magic (RIFF / fLaC / ID3-or-MPEG sync with
    * the layer bits separating MP3 from ADTS) and route to the
    * matching codec/scanner — the mixed-corpus triage operator. */
  def dispatchAudioRows(blobs: DataFrame): Dataset[AudioInventoryRow] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, b) =>
          require(b.length >= 4, "audio: blob too short to sniff")
          if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') {
            val samples = WavCodec.decodePcm16(b)
            AudioInventoryRow(id, "wav", 8000L,
              samples.length.toLong * 1000 / 8000,
              samples.length.toLong)
          } else if (b(0) == 'f' && b(1) == 'L' && b(2) == 'a' &&
            b(3) == 'C') {
            val samples = FlacCodec.decode(b)
            AudioInventoryRow(id, "flac", 8000L,
              samples.length.toLong * 1000 / 8000,
              samples.length.toLong)
          } else if (b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
            val m = Mp3Scan.scan(b) // ID3 prefix → an MP3 stream
            AudioInventoryRow(id, "mp3", m.sample_rate,
              m.duration_ms, m.n_frames)
          } else if ((b(0) & 0xff) == 0xff &&
            (b(1) & 0xf0) == 0xf0) {
            // MPEG sync: layer bits 01 → MP3 Layer III, 00 → ADTS
            if ((b(1) & 0x06) == 0x02) {
              val m = Mp3Scan.scan(b)
              AudioInventoryRow(id, "mp3", m.sample_rate,
                m.duration_ms, m.n_frames)
            } else {
              val a = AacScan.scan(b)
              AudioInventoryRow(id, "aac", a.sample_rate,
                a.duration_ms, a.n_frames)
            }
          } else throw new IllegalArgumentException(
            "audio: unrecognized container magic")
        }
      }
  }

  /** Per-doc MP3 inventory row (the [[Mp3Scan]] aggregates). */
  case class Mp3Row(doc_id: Long, n_frames: Long, sample_rate: Long,
                    n_padded: Long, min_kbps: Long, max_kbps: Long,
                    cbr: Long, duration_ms: Long, total_bytes: Long)

  /** Scan each MP3 payload with [[Mp3Scan]] — same partition-local
    * byte-blob topology as every codec seam. */
  def scanMp3Rows(blobs: DataFrame): Dataset[Mp3Row] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val m = Mp3Scan.scan(payload)
          Mp3Row(id, m.n_frames, m.sample_rate, m.n_padded,
            m.min_kbps, m.max_kbps, m.cbr, m.duration_ms,
            m.total_bytes)
        }
      }
  }

  /** Synthetic ADTS AAC streams for the e213 scan gate: per-frame
    * explicit 13-bit lengths (filler payloads of varying size),
    * alternating 1/2 raw-data blocks per frame, VBR buffer-fullness
    * markers on most docs, mono/stereo by doc parity. */
  def syntheticAac(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
          val nf = (6 + id % 9).toInt
          val sfi = (3 + id % 3).toInt // 48000 / 44100 / 32000
          val ch = (1 + id % 2).toInt
          for (f <- 0 until nf) {
            val flen = (57 + (id * 7 + f * 13) % 400).toInt
            val rdb = f % 2 // 1 or 2 raw data blocks
            val fullness = if (id % 5 == 0) 0x123 else 0x7ff
            buf += 0xff.toByte
            buf += 0xf1.toByte // sync + MPEG-4 + layer 00 + no CRC
            // profile AAC LC (1), sfi, private 0, chan high bit
            buf += ((1 << 6) | (sfi << 2) | (ch >> 2)).toByte
            buf += (((ch & 3) << 6) | ((flen >> 11) & 3)).toByte
            buf += ((flen >> 3) & 0xff).toByte
            buf += (((flen & 7) << 5) | ((fullness >> 6) & 0x1f)).toByte
            buf += (((fullness & 0x3f) << 2) | rdb).toByte
            for (j <- 7 until flen)
              buf += ((id + f * 11 + j) % 256).toByte
          }
          (id, buf.toArray)
        }
      }.toDF("doc_id", "payload")
  }

  /** Per-doc AAC inventory row (the [[AacScan]] aggregates). */
  case class AacRow(doc_id: Long, n_frames: Long, sample_rate: Long,
                    channels: Long, n_blocks: Long, duration_ms: Long,
                    min_frame_len: Long, max_frame_len: Long,
                    vbr: Long, total_bytes: Long)

  /** Scan each ADTS payload with [[AacScan]]. */
  def scanAacRows(blobs: DataFrame): Dataset[AacRow] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val m = AacScan.scan(payload)
          AacRow(id, m.n_frames, m.sample_rate, m.channels,
            m.n_blocks, m.duration_ms, m.min_frame_len,
            m.max_frame_len, m.vbr, m.total_bytes)
        }
      }
  }

  /** Synthetic Avro object containers (e214): per doc 3..7 records
    * of the (rec_id, score, tag) shape, two data blocks, deflate
    * codec on even docs — scores are dyadic (k·0.5 + r·0.25) so the
    * IEEE doubles are exact on both engines. */
  def syntheticAvro(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val recs = (0 until (3 + id % 5).toInt).map { r =>
            AvroBlob.Rec(id * 100 + r,
              (id % 97) * 0.5 + r * 0.25,
              "t" + ((id + r) % 10))
          }
          (id, AvroBlob.encode(recs, deflate = id % 2 == 0,
            syncSeed = id))
        }
      }.toDF("doc_id", "payload")
  }

  /** One decoded Avro record row. */
  case class AvroRecRow(doc_id: Long, rec_id: Long, score: Double,
                        tag: String)

  /** Decode each Avro container with [[AvroBlob]]. */
  def decodeAvroRows(blobs: DataFrame): Dataset[AvroRecRow] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          AvroBlob.decode(payload).map(r =>
            AvroRecRow(id, r.rec_id, r.score, r.tag))
        }
      }
  }

  /** Synthetic two-picture H.264 streams for the P-frame gate
    * (e217): a per-pixel I_PCM IDR, then a P frame whose top and
    * bottom MB rows are P_SKIP (exact copy) and whose middle row is
    * P_L0_16x16 with even-full-pel vectors (2·(mx−1), −10) px —
    * shifted, edge-clamped copies through real mb_skip_run, mvd, and
    * median-predictor coding. */
  def syntheticH264PFrame(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    val g = H264MbGrid
    ids.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val mbs = for (my <- 0 until g; mx <- 0 until g) yield
            (H264Codec.PcmMb(Array.tabulate(256)(i =>
              synthH264Px(id, mx * 16 + i % 16,
                my * 16 + i / 16))): H264Codec.Mb)
          val pmbs = for (my <- 0 until g; mx <- 0 until g) yield
            if (my == 1)
              (H264Codec.PMvMb(8 * (mx - 1), -40): H264Codec.PMb)
            else H264Codec.PSkip
          (id, H264Codec.encodeIP(g, g, mbs, pmbs))
        }
      }.toDF("doc_id", "payload")
  }

  /** Synthetic H.264 streams for the SUB-PEL motion gate (e218):
    * same I_PCM reference as e217, but the P frame's middle row
    * moves at HALF-PEL positions — row 1 horizontal (xF=2, shift
    * (mx−1, −10) full-pel), row 2 vertical (yF=2, shift (0, −10)) —
    * so the decoder must run the real 6-tap (1,−5,20,20,−5,1)
    * interpolation with edge clamping; the oracle evaluates the
    * identical filter in SQL. */
  def syntheticH264SubPel(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    val g = H264MbGrid
    ids.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val mbs = for (my <- 0 until g; mx <- 0 until g) yield
            (H264Codec.PcmMb(Array.tabulate(256)(i =>
              synthH264Px(id, mx * 16 + i % 16,
                my * 16 + i / 16))): H264Codec.Mb)
          val pmbs = for (my <- 0 until g; mx <- 0 until g) yield
            if (my == 1)
              (H264Codec.PMvMb(4 * (mx - 1) + 2, -40): H264Codec.PMb)
            else if (my == 2) H264Codec.PMvMb(0, -38) // yF = 2
            else H264Codec.PSkip
          (id, H264Codec.encodeIP(g, g, mbs, pmbs))
        }
      }.toDF("doc_id", "payload")
  }

  /** Synthetic H.264 streams for the B-frame gate (e223): I_PCM IDR
    * + one non-reference B frame — row 0 B_L0 (+2 px right), row 1
    * B_Bi (the default-weight average of ±2 px), row 2 B_L1 (4 px
    * up); all full-pel so the oracle is three clamped lookups and
    * one rounded average. */
  def syntheticH264BFrame(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    val g = H264MbGrid
    ids.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val mbs = for (my <- 0 until g; mx <- 0 until g) yield
            (H264Codec.PcmMb(Array.tabulate(256)(i =>
              synthH264Px(id, mx * 16 + i % 16,
                my * 16 + i / 16))): H264Codec.Mb)
          val bMbs = for (my <- 0 until g; _ <- 0 until g) yield
            (my match {
              case 0 => H264Codec.BL0Mb(8, 0)
              case 1 => H264Codec.BBiMb(8, 0, -8, 0)
              case _ => H264Codec.BL1Mb(0, -16)
            }): H264Codec.BMb
          (id, H264Codec.encodeIB(g, g, mbs, bMbs))
        }
      }.toDF("doc_id", "payload")
  }

  /** One decoded luma row of one picture in a sequence. */
  case class VideoLumaRow(doc_id: Long, frame_idx: Long, y: Long,
                          n_px: Long, sum_y: Long, min_y: Long,
                          max_y: Long)

  /** Decode each multi-picture H.264 payload and emit per-row luma
    * features for every frame. */
  def decodeH264FrameRows(blobs: DataFrame): Dataset[VideoLumaRow] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          H264Codec.decodeSequence(payload).zipWithIndex.flatMap {
            case (f, fi) =>
              (0 until f.height).map { yy =>
                var s = 0L; var mn = Long.MaxValue; var mx = 0L
                var x = 0
                while (x < f.width) {
                  val v = f.y(yy * f.width + x).toLong
                  s += v
                  if (v < mn) mn = v
                  if (v > mx) mx = v
                  x += 1
                }
                VideoLumaRow(id, fi.toLong, yy.toLong,
                  f.width.toLong, s, mn, mx)
              }
          }
        }
      }
  }

  /** One decoded luma row with integer-exact features. */
  case class LumaRow(doc_id: Long, y: Long, n_px: Long, sum_y: Long,
                     min_y: Long, max_y: Long)

  /** Decode each H.264 payload with [[H264Codec]] and emit per-row
    * luma features — same iterator→iterator partition-local topology
    * as every codec seam (decode never shuffles). */
  def decodeH264Rows(blobs: DataFrame): Dataset[LumaRow] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val f = H264Codec.decode(payload)
          (0 until f.height).iterator.map { y =>
            val row = f.y.slice(y * f.width, (y + 1) * f.width)
            LumaRow(id, y.toLong, f.width.toLong,
              row.map(_.toLong).sum, row.min.toLong, row.max.toLong)
          }
        }
      }
  }

  case class TextBlobRow(doc_id: Long, n_chars: Long, fp: String)

  /** Inflate each gzip payload back to text and fingerprint it —
    * the ingest path for compressed text corpora, same
    * iterator→iterator partition-local topology as the media
    * codecs. GZIPInputStream verifies the member CRC. */
  def decodeGzipText(blobs: DataFrame): Dataset[TextBlobRow] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, payload) =>
          val gz = new java.util.zip.GZIPInputStream(
            new java.io.ByteArrayInputStream(payload))
          val bytes = gz.readAllBytes(); gz.close()
          md.reset()
          val fp = md.digest(bytes).map(b => f"$b%02x").mkString
          val text = new String(bytes, "UTF-8")
          TextBlobRow(id, text.codePointCount(0, text.length).toLong, fp)
        }
      }
  }

  def decodeFrames(blobs: DataFrame): Dataset[DecodedFrame] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // <-- a real codec would initialize here, once per partition
        it.flatMap { case (id, payload) =>
          payload.grouped(FrameBytes).zipWithIndex.map {
            case (frame, idx) =>
              DecodedFrame(id, idx, frame.length,
                frame.foldLeft(0L)((a, b) => a + (b & 0xff)))
          }
        }
      }
  }
}
