package graft

import org.apache.spark.sql.functions._

import graft.ops.{Resample, TickPrep}

/** G1–G3 OHLC resample semantics (`hybrid_merger.py:100-112`). */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def ticks = Seq(
    // minute 14:05 — three ticks, out of arrival order within the minute
    (ts("2015-03-02 14:05:40"), 3L, 1.58, 0.02),
    (ts("2015-03-02 14:05:05"), 1L, 1.50, 0.01),
    (ts("2015-03-02 14:05:20"), 2L, 1.61, 0.03),
    // minute 14:07 — single tick (gap at 14:06)
    (ts("2015-03-02 14:07:59"), 4L, 1.40, 0.02))
    .toDF("datetime", "tick_id", "mid", "spread")

  test("G1: open/close are time-ordered first/last; high/low are extremes; " +
    "bucket is the minute floor") {
    val c = Resample.ohlc1min(ticks).orderBy("datetime").collect()
    assert(c.length == 2) // no bucket materializes for the empty minute
    val m5 = c(0)
    assert(m5.getTimestamp(0) == ts("2015-03-02 14:05:00"))
    assert(m5.getDouble(1) == 1.50) // open = earliest tick, not first row
    assert(m5.getDouble(2) == 1.61) // high
    assert(m5.getDouble(3) == 1.50) // low
    assert(m5.getDouble(4) == 1.58) // close = latest tick
    assert(m5.getLong(5) == 3L)     // G3: tick-count volume
    assert(math.abs(m5.getDouble(6) - 0.02) < 1e-12) // G2: mean spread
  }

  test("G1: timestamp ties break deterministically on tick_id") {
    val tied = Seq(
      (ts("2015-03-02 14:05:00"), 2L, 9.0, 0.0),
      (ts("2015-03-02 14:05:00"), 1L, 5.0, 0.0),
      (ts("2015-03-02 14:05:00"), 3L, 7.0, 0.0))
      .toDF("datetime", "tick_id", "mid", "spread")
    val c = Resample.ohlc1min(tied).head()
    assert(c.getDouble(1) == 5.0) // open: lowest tick_id among ties
    assert(c.getDouble(4) == 7.0) // close: highest tick_id among ties
  }

  test("F1/F2: tick prep drops garbage quotes and closed-market hours") {
    val raw = Seq(
      (ts("2024-01-03 10:00:00"), 1L, 1.5, 1.4),   // Wed — kept
      (ts("2024-01-03 10:00:01"), 2L, 0.00001, 1.4), // garbage ask
      (ts("2024-01-06 10:00:00"), 3L, 1.5, 1.4),   // Saturday
      (ts("2024-01-05 22:30:00"), 4L, 1.5, 1.4),   // Friday 22:30
      (ts("2024-01-07 20:59:00"), 5L, 1.5, 1.4),   // Sunday < 21:00
      (ts("2024-01-07 21:00:00"), 6L, 1.5, 1.4))   // Sunday 21:00 — kept
      .toDF("datetime", "tick_id", "ask", "bid")
    val kept = TickPrep(raw).select("tick_id").as[Long].collect().toSet
    assert(kept == Set(1L, 6L))
  }

  test("salted two-phase OHLC equals the plain aggregate (skew path)") {
    val many = (0 until 500).map { i =>
      (ts(s"2015-03-02 14:0${i % 3}:${10 + i % 40}"), i.toLong,
        1.0 + (i % 97) * 0.01, 0.01 + (i % 7) * 0.001)
    }.toDF("datetime", "tick_id", "mid", "spread")
    val plain = Resample.ohlc1min(many).orderBy("datetime").collect()
    val salted = Resample.ohlc1minSalted(many, salts = 8)
      .orderBy("datetime").collect()
    assert(plain.length == salted.length)
    plain.zip(salted).foreach { case (p, s) =>
      assert(p.getTimestamp(0) == s.getTimestamp(0))
      assert(p.getDouble(1) == s.getDouble(1)) // open
      assert(p.getDouble(2) == s.getDouble(2)) // high
      assert(p.getDouble(3) == s.getDouble(3)) // low
      assert(p.getDouble(4) == s.getDouble(4)) // close
      assert(p.getLong(5) == s.getLong(5))     // volume
      assert(math.abs(p.getDouble(6) - s.getDouble(6)) < 1e-9) // spread
    }
  }

  test("P6/P7: mid and spread derivation") {
    val one = Seq((ts("2024-01-03 10:00:00"), 1L, 1.6, 1.4))
      .toDF("datetime", "tick_id", "ask", "bid")
    val r = TickPrep.deriveMidSpread(one).head()
    assert(r.getAs[Double]("mid") == 1.5)
    assert(math.abs(r.getAs[Double]("spread") - 0.2) < 1e-12)
  }
}
