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
  *    whose libraries this container lacks (image/video);
  *  - [[decodeWavFrames]]: a REAL pure-JVM PCM WAV decoder
  *    ([[WavCodec]], VERDICT r8 #6) — RIFF chunk walk + PCM16 parse,
  *    oracle-gated end-to-end via `e65_wav_codec_frames`.
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
