package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY §7 E-ops): treat image/audio/video
  * payloads as opaque `binary` columns with typed metadata, and run
  * decode/feature-extraction as partition-local batch functions.
  *
  * The Spark-side plumbing — schema, batching, partitioning, feature
  * extraction over fixed-size frames — is real and tested. The actual
  * codec is STUBBED with a deterministic fake (this container has no
  * image/audio libraries): `decodeStub` is the seam where a real decoder
  * (e.g. a JNI codec or an external model server client) plugs in, called
  * per partition so the codec initializes once per task, not per row.
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
