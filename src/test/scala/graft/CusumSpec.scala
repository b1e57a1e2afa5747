package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ext.EventAnalytics
import graft.streaming.StreamingCusum
import graft.streaming.StreamingCusum.{CusumOut, EventIn}

/** Two-sided CUSUM: the planted-shift contract (a small sustained
  * drift alarms even though no single value is extreme) and the
  * batch/stream twin equality. */
class CusumSpec extends SparkSpec {
  import spark.implicits._

  // reference fold in plain Scala — the ground truth both forms chase
  private def fold(xs: Seq[Double], meanS: Double, k: Double)
      : Seq[(Double, Double)] = {
    var sp = 0.0; var sn = 0.0
    xs.map { x =>
      val dev = x / 100.0 - meanS
      sp = math.max(0.0, sp + dev - k)
      sn = math.max(0.0, sn - dev - k)
      (sp, sn)
    }
  }

  test("a small sustained shift alarms; the on-reference stretch " +
    "never does") {
    // u1: 20 events AT the reference mean, then 20 shifted to 80 —
    // dev = +0.3 per shifted event, so s⁺ crosses h = 1.0 within ~4
    // events even though no single value is an outlier. u2's low
    // block balances the corpus mean to exactly 50 (a CUSUM baseline
    // is a reference parameter: a shift folded INTO the reference
    // would read as baseline drift — which is the monitor working,
    // not failing, and why e136 passes the trained mean explicitly).
    val base = (1 to 20).map(i =>
      (1L, i.toLong, ts(f"2024-01-01 09:${i % 60}%02d:00"), 50.0))
    val shifted = (21 to 40).map(i =>
      (1L, i.toLong, ts(f"2024-01-01 10:${i % 60}%02d:00"), 80.0))
    val balance = (41 to 60).map(i =>
      (2L, i.toLong, ts(f"2024-01-01 09:${i % 60}%02d:00"), 20.0))
    val ev = (base ++ shifted ++ balance)
      .toDF("user_id", "event_id", "ts", "value")
    val rows = EventAnalytics.cusum(ev).collect()
      .filter(_.getAs[Long]("user_id") == 1L)
      .sortBy(_.getAs[Long]("event_id"))
    val alarms = rows.map(_.getAs[Boolean]("alarm"))
    assert(!alarms.take(20).exists(identity),
      "on-reference stretch must not alarm")
    assert(alarms.drop(25).forall(identity),
      "sustained shift must alarm")
    // the emitted statistics equal the reference fold exactly
    val want = fold((base ++ shifted).map(_._4), 0.5, 0.05)
    rows.zip(want).foreach { case (r, (sp, sn)) =>
      assert(r.getAs[Double]("s_pos") ==
        Rounding.duckRoundDouble(sp, 6))
      assert(r.getAs[Double]("s_neg") ==
        Rounding.duckRoundDouble(sn, 6))
    }
  }

  test("streaming state carries across batches and equals the batch " +
    "fold") {
    implicit val sqlCtx = spark.sqlContext
    val meanS = 0.5
    val mem = MemoryStream[EventIn]
    val q = StreamingCusum.cusum(mem.toDS(), meanS)
      .writeStream.outputMode("append")
      .format("memory").queryName("cusum_out").start()
    mem.addData(
      EventIn(1L, 11L, ts("2024-01-01 10:01:00"), 80.0),
      EventIn(1L, 10L, ts("2024-01-01 10:00:00"), 90.0))
    q.processAllAvailable()
    mem.addData(
      EventIn(1L, 12L, ts("2024-01-01 10:02:00"), 10.0),
      EventIn(1L, 13L, ts("2024-01-01 10:03:00"), 95.0))
    q.processAllAvailable()
    val rows = spark.table("cusum_out").as[CusumOut].collect()
      .sortBy(_.event_id)
    q.stop()
    val want = fold(Seq(90.0, 80.0, 10.0, 95.0), meanS, 0.05)
    assert(rows.map(r => (r.s_pos, r.s_neg)).toSeq ==
      want.map { case (sp, sn) =>
        (Rounding.duckRoundDouble(sp, 6), Rounding.duckRoundDouble(sn, 6))
      })
  }
}
