package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingEwma
import graft.streaming.StreamingEwma.{EventIn, EwmaOut}

/** Stateful streaming EWMA: per-key running sums carried across
  * micro-batches, within-batch (ts, event_id) ordering, and the
  * value-level contract — each emission equals the batch closed form
  * over everything the key has seen so far. */
class StreamingEwmaSpec extends SparkSpec {
  import spark.implicits._

  private def closedForm(xs: Seq[Double], alpha: Double): Seq[Double] =
    xs.indices.map { i =>
      val w = (0 to i).map(j => math.pow(1.0 - alpha, i - j))
      (0 to i).map(j => w(j) * xs(j)).sum / w.sum
    }

  test("state carries across batches and matches the closed form") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventIn]
    val q = StreamingEwma.ewma(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("ewma_out").start()

    // batch 1: two users interleaved, one batch-2 event OUT OF ORDER
    // within its batch (later ts added first) — the in-batch sort must
    // fold it correctly
    mem.addData(
      EventIn(1L, 10L, ts("2024-01-01 10:00:00"), 10.0),
      EventIn(2L, 11L, ts("2024-01-01 10:00:00"), 100.0),
      EventIn(1L, 12L, ts("2024-01-01 10:01:00"), 20.0))
    q.processAllAvailable()
    mem.addData(
      EventIn(1L, 14L, ts("2024-01-01 10:03:00"), 40.0),
      EventIn(1L, 13L, ts("2024-01-01 10:02:00"), 5.0),
      EventIn(2L, 15L, ts("2024-01-01 10:03:00"), 50.0))
    q.processAllAvailable()
    val rows = spark.table("ewma_out").as[EwmaOut].collect()
    q.stop()

    val u1 = rows.filter(_.user_id == 1L).sortBy(_.event_id)
      .map(_.ewma_value).toSeq
    val u2 = rows.filter(_.user_id == 2L).sortBy(_.event_id)
      .map(_.ewma_value).toSeq
    val want1 = closedForm(Seq(10.0, 20.0, 5.0, 40.0), 0.1)
      .map(Rounding.duckRoundDouble(_, 6))
    val want2 = closedForm(Seq(100.0, 50.0), 0.1)
      .map(Rounding.duckRoundDouble(_, 6))
    assert(u1 == want1, s"u1: $u1 vs $want1")
    assert(u2 == want2, s"u2: $u2 vs $want2")
  }
}
