package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingGapBridge
import graft.streaming.StreamingGapBridge.{CandleIn, CandleOut}

/** Stateful streaming gap bridge: flats across batches, per-key state,
  * immutable-grid late-arrival handling. */
class StreamingGapBridgeSpec extends SparkSpec {
  import spark.implicits._

  test("gaps are bridged with flat candles across micro-batches, " +
    "per key, and late candles never rewrite bridged history") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[CandleIn]
    val q = StreamingGapBridge.bridge(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("bridge_out").start()

    def candle(key: String, t: String, close: Double) =
      CandleIn(key, ts(t), close, close + 0.1, close - 0.1, close, 5L,
        0.02)

    // batch 1: two keys, EURUSD has a 2-minute gap
    mem.addData(
      candle("EURUSD", "2024-01-03 10:00:00", 1.0),
      candle("EURUSD", "2024-01-03 10:03:00", 1.3),
      candle("GBPUSD", "2024-01-03 10:01:00", 2.0))
    q.processAllAvailable()
    // batch 2: gap continues across the batch boundary (state carries);
    // plus a LATE candle behind EURUSD's frontier — must be ignored
    mem.addData(
      candle("EURUSD", "2024-01-03 10:05:00", 1.5),
      candle("EURUSD", "2024-01-03 10:01:00", 9.9), // late, pre-frontier
      candle("GBPUSD", "2024-01-03 10:02:00", 2.1))
    q.processAllAvailable()
    val rows = spark.table("bridge_out").as[CandleOut].collect()
    q.stop()

    val eur = rows.filter(_.key == "EURUSD")
      .sortBy(_.datetime.getTime)
    assert(eur.map(c => (c.datetime, c.is_flat, c.close)).toSeq == Seq(
      (ts("2024-01-03 10:00:00"), 0, 1.0),
      (ts("2024-01-03 10:01:00"), 1, 1.0), // flat, NOT the late 9.9
      (ts("2024-01-03 10:02:00"), 1, 1.0),
      (ts("2024-01-03 10:03:00"), 0, 1.3),
      (ts("2024-01-03 10:04:00"), 1, 1.3), // bridged across batches
      (ts("2024-01-03 10:05:00"), 0, 1.5)))
    eur.filter(_.is_flat == 1).foreach { f =>
      assert(f.volume == 0L && f.open == f.close && f.high == f.close &&
        f.low == f.close)
    }
    // per-key isolation: GBPUSD saw no flats (consecutive minutes)
    val gbp = rows.filter(_.key == "GBPUSD").sortBy(_.datetime.getTime)
    assert(gbp.map(_.is_flat).toSeq == Seq(0, 0))
  }

  test("event-time TTL expires quiescent keys; a resumed key restarts " +
    "its grid instead of bridging across the idle span") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[CandleIn]
    val q = StreamingGapBridge.bridge(
        mem.toDS().withWatermark("datetime", "0 seconds"),
        idleTtlMinutes = Some(30))
      .writeStream.outputMode("append")
      .format("memory").queryName("ttl_out").start()

    def candle(key: String, t: String, close: Double) =
      CandleIn(key, ts(t), close, close, close, close, 1L, 0.01)

    mem.addData(candle("A", "2024-01-03 10:00:00", 1.0),
      candle("B", "2024-01-03 10:00:00", 2.0))
    q.processAllAvailable()
    mem.addData(candle("B", "2024-01-03 11:00:00", 2.5))
    q.processAllAvailable() // watermark → 11:00, past A's 10:30 timeout
    mem.addData(candle("B", "2024-01-03 11:05:00", 2.6))
    q.processAllAvailable() // A has no data this batch → state expires
    mem.addData(candle("A", "2024-01-03 11:30:00", 1.2))
    q.processAllAvailable() // A resumes with fresh state
    val rows = spark.table("ttl_out").as[CandleOut].collect()
    q.stop()

    val a = rows.filter(_.key == "A").sortBy(_.datetime.getTime)
    // no flat candles bridged across A's expired idle span
    assert(a.map(c => (c.datetime, c.is_flat)).toSeq == Seq(
      (ts("2024-01-03 10:00:00"), 0), (ts("2024-01-03 11:30:00"), 0)))
    // B stayed active: its gaps are fully bridged (59 + 4 flats)
    val b = rows.filter(_.key == "B")
    assert(b.count(_.is_flat == 1) == 63)
    assert(b.count(_.is_flat == 0) == 3)
  }

  test("timeout clamp: late re-sends behind the frontier while the " +
    "watermark sits past the key's TTL do not kill the query") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[CandleIn]
    val q = StreamingGapBridge.bridge(
        mem.toDS().withWatermark("datetime", "0 seconds"),
        idleTtlMinutes = Some(0)) // TTL 0: timeout = frontier minute
      .writeStream.outputMode("append")
      .format("memory").queryName("clamp_out").start()

    def candle(t: String, close: Double) =
      CandleIn("A", ts(t), close, close, close, close, 1L, 0.01)

    mem.addData(candle("2024-01-03 10:00:00", 1.0))
    q.processAllAvailable() // watermark → 10:00:00
    mem.addData(candle("2024-01-03 10:00:45", 1.1)) // late vs frontier
    q.processAllAvailable() // watermark → 10:00:45
    // frontier minute still 10:00 → unclamped timeout (10:00:00.000)
    // would be BEHIND the 10:00:45 watermark: without the clamp Spark
    // rejects it with IllegalArgumentException and the query dies here
    mem.addData(candle("2024-01-03 10:00:50", 1.15))
    q.processAllAvailable()
    mem.addData(candle("2024-01-03 10:02:00", 1.2))
    q.processAllAvailable()
    val rows = spark.table("clamp_out").as[CandleOut].collect()
    q.stop()

    // both sub-minute lates ignored; the grid continued past them
    assert(rows.sortBy(_.datetime.getTime)
      .map(c => (c.datetime, c.is_flat, c.close)).toSeq == Seq(
        (ts("2024-01-03 10:00:00"), 0, 1.0),
        (ts("2024-01-03 10:01:00"), 1, 1.0),
        (ts("2024-01-03 10:02:00"), 0, 1.2)))
  }
}
