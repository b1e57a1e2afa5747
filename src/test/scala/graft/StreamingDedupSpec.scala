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
    // copies inside k's 10:00–10:30 window → suppressed, counted
    mem.addData(DocIn("k", 6L, ts("2024-01-03 10:05:00")),
      DocIn("k", 7L, ts("2024-01-03 10:10:00")))
    q.processAllAvailable()
    // k's copy at 11:00 lands PAST its 10:30 horizon → re-admitted in
    // the data path immediately (no idle batch needed — the TTL runs
    // from the FIRST occurrence and is NOT refreshed by suppressed
    // copies: fixed-window dedup, the dropDuplicates-with-watermark
    // contract), carrying the 2 copies the first incarnation dropped
    mem.addData(DocIn("k", 3L, ts("2024-01-03 11:00:00")))
    q.processAllAvailable()
    // k's new window runs 11:00–11:30, so a copy at 11:01 is suppressed
    mem.addData(DocIn("k", 4L, ts("2024-01-03 11:01:00")))
    q.processAllAvailable()
    // x went idle: its state was GC'd once the watermark passed 10:30,
    // and a later copy is re-emitted as a fresh first occurrence
    mem.addData(DocIn("x", 5L, ts("2024-01-03 11:30:00")))
    q.processAllAvailable()
    val rows = spark.table("dedup_ttl_out").as[DocOut].collect()
    q.stop()

    assert(rows.filter(_.fp == "x").map(_.doc_id).sorted.toSeq ==
      Seq(1L, 5L))
    assert(rows.filter(_.fp == "k").map(_.doc_id).sorted.toSeq ==
      Seq(2L, 3L))
    // the re-admitted survivor surfaces the previous incarnation's
    // suppressed-copy count; true first occurrences carry 0
    assert(rows.find(r => r.fp == "k" && r.doc_id == 3L)
      .map(_.n_dropped_before) == Some(2L))
    assert(rows.filter(r => r.doc_id != 3L).forall(_.n_dropped_before == 0L))
  }

  test("a single batch straddling several TTL windows emits one " +
    "survivor per window (ADVICE r5)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DocIn]
    val q = StreamingDedup.dedup(
        mem.toDS().withWatermark("ts", "0 seconds"),
        idleTtlMinutes = Some(30))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_multiwin_out").start()

    // ONE batch spanning three 30-min windows of fp "m":
    //   w1 [10:00, 10:30]: first 10:00 (survivor 8), copies 10:10, 10:30
    //   w2 [10:45, 11:15]: first 10:45 (survivor 2; ties at 10:45 break
    //                      to min doc_id), copy 11:10
    //   w3 [11:20, 11:50]: first 11:20 (survivor 9)
    mem.addData(
      DocIn("m", 8L, ts("2024-01-03 10:00:00")),
      DocIn("m", 5L, ts("2024-01-03 10:10:00")),
      DocIn("m", 6L, ts("2024-01-03 10:30:00")),
      DocIn("m", 4L, ts("2024-01-03 10:45:00")),
      DocIn("m", 2L, ts("2024-01-03 10:45:00")),
      DocIn("m", 7L, ts("2024-01-03 11:10:00")),
      DocIn("m", 9L, ts("2024-01-03 11:20:00")))
    q.processAllAvailable()
    // the NEXT batch's in-window copy proves the final window's state
    // carried over (11:25 is inside w3, suppressed)
    mem.addData(DocIn("m", 10L, ts("2024-01-03 11:25:00")))
    q.processAllAvailable()
    val rows = spark.table("dedup_multiwin_out").as[DocOut].collect()
    q.stop()

    assert(rows.map(r => (r.doc_id, r.n_dropped_before)).sortBy(_._1)
      .toSeq == Seq((2L, 2L), (8L, 0L), (9L, 2L)))
  }
}
