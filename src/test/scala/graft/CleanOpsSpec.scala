package graft

import org.apache.spark.sql.functions._

import graft.ops.CleanOps

/** F5/U1/F6 validation & repair (`hybrid_merger.py:145-173`), including
  * the order-sensitivity hard-part: the spike filter's lag runs over rows
  * that SURVIVED the earlier stages (SURVEY §7 risk #1). */
class CleanOpsSpec extends SparkSpec {
  import spark.implicits._

  test("F5: inverted candles dropped; complement captured") {
    val candles = Seq(
      (ts("2024-01-01 00:00:00"), 1.0, 2.0, 0.5, 1.5, 1L, 0.01),
      (ts("2024-01-01 00:01:00"), 1.0, 0.5, 2.0, 1.5, 1L, 0.01)) // inverted
      .toDF("datetime", "open", "high", "low", "close", "volume", "spread")
    assert(CleanOps.dropInverted(candles).count() == 1)
    assert(CleanOps.invertedRows(candles).head().getTimestamp(0) ==
      ts("2024-01-01 00:01:00"))
  }

  test("U1: repair widens candle to contain open/close and ffills the " +
    "voided spread") {
    val candles = Seq(
      (ts("2024-01-01 00:00:00"), 1.0, 1.2, 0.8, 1.1, 1L, 0.05),
      // open above high → widen high to open, spread voided then ffilled
      (ts("2024-01-01 00:01:00"), 1.5, 1.2, 0.8, 1.1, 1L, 0.09))
      .toDF("datetime", "open", "high", "low", "close", "volume", "spread")
    val r = CleanOps.structuralRepair(candles).orderBy("datetime").collect()
    assert(r(1).getAs[Double]("high") == 1.5)
    assert(r(1).getAs[Double]("low") == 0.8)
    assert(r(1).getAs[Double]("spread") == 0.05) // ffilled from row 0
    // post-repair invariant: low <= min(o,c) <= max(o,c) <= high
    r.foreach { row =>
      val (o, h, l, c) = (row.getAs[Double]("open"),
        row.getAs[Double]("high"), row.getAs[Double]("low"),
        row.getAs[Double]("close"))
      assert(l <= math.min(o, c) && math.max(o, c) <= h)
    }
  }

  test("F6: lag is computed over surviving rows, not the raw frame") {
    // Raw closes: 1.00, [inverted row close 5.00], 1.001
    // Lag over raw frame: pct(1.001 vs 5.00) = 80% → would be dropped.
    // Lag over survivors: pct(1.001 vs 1.00) = 0.1% → must be kept.
    val candles = Seq(
      (ts("2024-01-01 00:00:00"), 1.0, 1.001, 0.999, 1.0, 1L, 0.01),
      (ts("2024-01-01 00:01:00"), 5.0, 4.0, 6.0, 5.0, 1L, 0.01), // inverted
      (ts("2024-01-01 00:02:00"), 1.001, 1.0015, 1.0005, 1.001, 1L, 0.01))
      .toDF("datetime", "open", "high", "low", "close", "volume", "spread")
    val out = CleanOps(candles, threshold = 0.005)
    assert(out.count() == 2) // both non-inverted rows survive
  }

  test("F6: first row's NULL pct_change keeps the row (pandas NaN " +
    "comparison semantics)") {
    val candles = Seq(
      (ts("2024-01-01 00:00:00"), 1.0, 1.001, 0.999, 1.0, 1L, 0.01))
      .toDF("datetime", "open", "high", "low", "close", "volume", "spread")
    assert(CleanOps.spikeFilter(candles, 0.005).count() == 1)
  }

  test("candles with NULL fields pass every validation filter unchanged " +
    "(pandas NaN-comparison semantics) instead of silently vanishing") {
    val D = (d: Double) => java.lang.Double.valueOf(d)
    val candles = Seq(
      (ts("2024-01-01 00:00:00"), null.asInstanceOf[java.lang.Double],
        D(1.2), D(0.8), D(1.1), 1L, D(0.05)), // NULL open
      (ts("2024-01-01 00:01:00"), D(1.0), D(1.001), D(0.999), D(1.0),
        1L, D(0.05)))
      .toDF("datetime", "open", "high", "low", "close", "volume", "spread")
    val out = CleanOps(candles, threshold = 0.5)
    assert(out.count() == 2) // NULL-field row kept, not dropped
    assert(CleanOps.invertedRows(candles).count() == 0)
    assert(CleanOps.structuralBadRows(candles).count() == 0)
    assert(CleanOps.spikeRows(candles, 0.5).count() == 0)
  }

  test("F6: amplitude breach alone drops a row") {
    val candles = Seq(
      (ts("2024-01-01 00:00:00"), 1.0, 1.1, 0.9, 1.0, 1L, 0.01))
      .toDF("datetime", "open", "high", "low", "close", "volume", "spread")
    assert(CleanOps.spikeFilter(candles, 0.005).count() == 0)
  }
}
