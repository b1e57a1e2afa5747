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
  *  - [[decodeFrames]]: the deterministic STUB standing in for codecs
  *    whose libraries this container lacks (now only video);
  *  - [[decodeWavFrames]]: a REAL pure-JVM PCM WAV decoder
  *    ([[WavCodec]], VERDICT r8 #6) — RIFF chunk walk + PCM16 parse,
  *    oracle-gated end-to-end via `e65_wav_codec_frames`;
  *  - [[decodeBmpRows]]: a REAL pure-JVM BMP image decoder
  *    ([[BmpCodec]], r10) — header walk + 24-bit BI_RGB with stride
  *    padding and both row orders, oracle-gated end-to-end via
  *    `e71_bmp_codec_rows`.
  *
  * Both use the same mapPartitions topology (iterator → iterator, codec
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
