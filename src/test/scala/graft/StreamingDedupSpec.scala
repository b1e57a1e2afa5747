package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingDedup
import graft.streaming.StreamingDedup.{DocIn, DocOut}

/** Streaming exact dedup: first-occurrence-wins across micro-batches,
  * deterministic within-batch survivor, TTL re-admission. */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("only the first occurrence of each fingerprint is emitted, " +
    "across batches, with a deterministic within-batch survivor") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DocIn]
    val q = StreamingDedup.dedup(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()

    // batch 1: fp "x" arrives 3 times in one batch (ties on ts broken by
    // doc_id), fp "y" once
    mem.addData(
      DocIn("x", 7L, ts("2024-01-03 10:00:05")),
      DocIn("x", 3L, ts("2024-01-03 10:00:05")),
      DocIn("x", 9L, ts("2024-01-03 10:00:01")),
      DocIn("y", 4L, ts("2024-01-03 10:00:02")))
    q.processAllAvailable()
    // batch 2: copies of both + one new fingerprint
    mem.addData(
      DocIn("x", 11L, ts("2024-01-03 10:05:00")),
      DocIn("y", 12L, ts("2024-01-03 10:05:00")),
      DocIn("z", 13L, ts("2024-01-03 10:05:00")))
    q.processAllAvailable()
    val rows = spark.table("dedup_out").as[DocOut].collect()
    q.stop()

    assert(rows.map(r => r.fp -> r.doc_id).sorted.toSeq ==
      Seq("x" -> 9L, "y" -> 4L, "z" -> 13L))
  }

  test("event-time TTL re-admits a fingerprint after its state expires") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DocIn]
    val q = StreamingDedup.dedup(
        mem.toDS().withWatermark("ts", "0 seconds"),
        idleTtlMinutes = Some(30))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_ttl_out").start()

    mem.addData(DocIn("x", 1L, ts("2024-01-03 10:00:00")),
      DocIn("k", 2L, ts("2024-01-03 10:00:00")))
    q.processAllAvailable()
    // k's copy at 11:00 arrives while the watermark is still 10:00
    // (before k's 10:30 expiry is observable) → suppressed; it also
    // advances the watermark to 11:00 for the next batch
    mem.addData(DocIn("k", 3L, ts("2024-01-03 11:00:00")))
    q.processAllAvailable()
    // watermark 11:00 is now past BOTH keys' 10:30 expiry: x (idle)
    // just drops state; k's fresh copy lands after its horizon and is
    // re-admitted as a new first occurrence — the TTL runs from the
    // FIRST occurrence and is NOT refreshed by suppressed copies
    // (fixed-window dedup, the dropDuplicates-with-watermark contract)
    mem.addData(DocIn("k", 4L, ts("2024-01-03 11:01:00")))
    q.processAllAvailable()
    // a copy of x after expiry is likewise re-emitted
    mem.addData(DocIn("x", 5L, ts("2024-01-03 11:30:00")))
    q.processAllAvailable()
    val rows = spark.table("dedup_ttl_out").as[DocOut].collect()
    q.stop()

    assert(rows.filter(_.fp == "x").map(_.doc_id).sorted.toSeq ==
      Seq(1L, 5L))
    assert(rows.filter(_.fp == "k").map(_.doc_id).sorted.toSeq ==
      Seq(2L, 4L))
  }
}
