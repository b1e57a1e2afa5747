package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingDrawdown
import graft.streaming.StreamingDrawdown.{DrawdownOut, EventIn}

/** Stateful streaming drawdown: (peak, maxDd) carried across
  * micro-batches, within-batch (ts, event_id) ordering, and the
  * value-level contract — each emission equals the batch causal
  * window form over everything the key has seen so far. */
class StreamingDrawdownSpec extends SparkSpec {
  import spark.implicits._

  private def closedForm(xs: Seq[Double])
      : Seq[(Double, Double, Double)] = {
    var peak = Double.NegativeInfinity
    var maxDd = Double.NegativeInfinity
    xs.map { x =>
      peak = math.max(peak, x)
      val dd = Rounding.duckRoundDouble((peak - x) / peak, 6)
      maxDd = math.max(maxDd, dd)
      (peak, dd, maxDd)
    }
  }

  test("state carries across batches and matches the batch fold") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventIn]
    val q = StreamingDrawdown.drawdown(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("dd_out").start()

    // batch 1: two users; one event arrives OUT OF ORDER within its
    // batch (later ts added first) — the in-batch sort must fold it
    mem.addData(
      EventIn(1L, 12L, ts("2024-01-01 10:01:00"), 5.0),
      EventIn(1L, 10L, ts("2024-01-01 10:00:00"), 10.0),
      EventIn(2L, 11L, ts("2024-01-01 10:00:00"), 8.0))
    q.processAllAvailable()
    // batch 2: u1 makes a new high then a deeper fall; the peak from
    // batch 1 must carry
    mem.addData(
      EventIn(1L, 13L, ts("2024-01-01 10:02:00"), 20.0),
      EventIn(1L, 14L, ts("2024-01-01 10:03:00"), 4.0),
      EventIn(2L, 15L, ts("2024-01-01 10:03:00"), 2.0))
    q.processAllAvailable()
    val rows = spark.table("dd_out").as[DrawdownOut].collect()
    q.stop()

    val u1 = rows.filter(_.user_id == 1L).sortBy(_.event_id)
      .map(r => (r.peak, r.drawdown, r.max_drawdown)).toSeq
    val u2 = rows.filter(_.user_id == 2L).sortBy(_.event_id)
      .map(r => (r.peak, r.drawdown, r.max_drawdown)).toSeq
    assert(u1 == closedForm(Seq(10.0, 5.0, 20.0, 4.0)), s"u1: $u1")
    assert(u2 == closedForm(Seq(8.0, 2.0)), s"u2: $u2")
  }
}
