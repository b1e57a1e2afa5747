package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingFunnel
import graft.streaming.StreamingFunnel.{EvIn, FunnelOut}

/** Streaming funnel: monotone per-user chain refinement across
  * micro-batches; the latest emission per user is the current chain. */
class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  private def latest(rows: Seq[FunnelOut]): Map[Long, FunnelOut] =
    rows.groupBy(_.user_id)
      .map { case (u, rs) => u -> rs.maxBy(_.emit_seq) }

  test("chain refines monotonically across batches; pre-view clicks " +
    "only count once a view precedes them") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EvIn]
    val q = StreamingFunnel.funnel(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel_out").start()

    // batch 1: u1 views then clicks; u2 only clicks (no view → nothing)
    mem.addData(
      EvIn(1L, ts("2024-01-01 10:00:00"), "view"),
      EvIn(1L, ts("2024-01-01 10:05:00"), "click"),
      EvIn(2L, ts("2024-01-01 09:00:00"), "click"))
    q.processAllAvailable()
    var out = latest(spark.table("funnel_out").as[FunnelOut].collect()
      .toIndexedSeq)
    assert(out(1L).click_ts == ts("2024-01-01 10:05:00") &&
      out(1L).purchase_ts == null)
    assert(!out.contains(2L))

    // batch 2: u1 purchases (after the click); u2 finally views —
    // chain starts, but its earlier click was pre-view and is gone
    // (the documented in-order arrival contract)
    mem.addData(
      EvIn(1L, ts("2024-01-02 08:00:00"), "purchase"),
      EvIn(2L, ts("2024-01-01 11:00:00"), "view"),
      EvIn(2L, ts("2024-01-01 12:00:00"), "click"))
    q.processAllAvailable()
    out = latest(spark.table("funnel_out").as[FunnelOut].collect()
      .toIndexedSeq)
    q.stop()
    assert(out(1L).purchase_ts == ts("2024-01-02 08:00:00"))
    assert(out(2L).view_ts == ts("2024-01-01 11:00:00") &&
      out(2L).click_ts == ts("2024-01-01 12:00:00"))
  }

  test("within one batch the chain equals the batch operator's " +
    "min-chain (ties and ordering)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EvIn]
    val q = StreamingFunnel.funnel(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel_out2").start()
    // one batch holding the full out-of-order history: the earliest
    // view wins, the first click AT-or-after it (same-instant counts),
    // then the first purchase at-or-after that click
    mem.addData(
      EvIn(5L, ts("2024-01-01 10:00:00"), "click"), // pre-view: ignored
      EvIn(5L, ts("2024-01-01 11:00:00"), "view"),
      EvIn(5L, ts("2024-01-01 11:00:00"), "click"), // same instant: ok
      EvIn(5L, ts("2024-01-01 10:30:00"), "purchase"), // pre-click
      EvIn(5L, ts("2024-01-01 12:00:00"), "purchase"))
    q.processAllAvailable()
    val out = latest(spark.table("funnel_out2").as[FunnelOut].collect()
      .toIndexedSeq)
    q.stop()
    assert(out(5L) == FunnelOut(5L, ts("2024-01-01 11:00:00"),
      ts("2024-01-01 11:00:00"), ts("2024-01-01 12:00:00"), 1L))
  }
}
