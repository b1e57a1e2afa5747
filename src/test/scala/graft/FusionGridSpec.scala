package graft

import org.apache.spark.sql.functions._

import graft.ops.{FusionOps, GridOps, SpreadOps}

/** J1–J4, F7/F8, T1/U2 fusion and grid semantics. */
class FusionGridSpec extends SparkSpec {
  import spark.implicits._

  private def cdl(t: String, c: Double) =
    (ts(t), c, c, c, c, 1L, 0.01)

  test("J2: combine_first prefers the tick cell, falls back to M1 per " +
    "cell, unions both key sets (pandas NaN = missing)") {
    val ticks = Seq(
      (ts("2024-01-01 00:00:00"), 1.0, null.asInstanceOf[java.lang.Double]),
      (ts("2024-01-01 00:01:00"), 2.0, java.lang.Double.valueOf(0.5)))
      .toDF("datetime", "close", "spread")
    val m1 = Seq(
      (ts("2024-01-01 00:00:00"), 9.0, java.lang.Double.valueOf(0.9)),
      (ts("2024-01-01 00:02:00"), 3.0, java.lang.Double.valueOf(0.3)))
      .toDF("datetime", "close", "spread")
    val f = FusionOps.combineFirst(ticks, m1).orderBy("datetime").collect()
    assert(f.length == 3) // union of both minute sets
    assert(f(0).getAs[Double]("close") == 1.0)  // tick wins
    assert(f(0).getAs[Double]("spread") == 0.9) // NaN cell falls back to M1
    assert(f(1).getAs[Double]("spread") == 0.5) // tick cell kept
    assert(f(2).getAs[Double]("close") == 3.0)  // M1-only minute appears
  }

  test("F7/F8: catastrophes detected above threshold and anti-joined away") {
    val ticks = Seq(cdl("2024-01-01 00:00:00", 1.0),
      cdl("2024-01-01 00:01:00", 9.0))
      .toDF("datetime", "open", "high", "low", "close", "volume", "spread")
    val m1 = Seq(cdl("2024-01-01 00:00:00", 1.005),
      cdl("2024-01-01 00:01:00", 1.0))
      .toDF("datetime", "open", "high", "low", "close", "volume", "spread")
    val cata = FusionOps.catastrophes(ticks, m1, 0.01)
    assert(cata.count() == 1)
    assert(cata.head().getTimestamp(0) == ts("2024-01-01 00:01:00"))
    val cleaned = FusionOps.rejectCatastrophes(ticks, cata)
    assert(cleaned.count() == 1)
    // unmatched minutes (NULL diff) are NOT catastrophes
    val m1Partial = Seq(cdl("2024-01-01 00:00:00", 1.0))
      .toDF("datetime", "open", "high", "low", "close", "volume", "spread")
    assert(FusionOps.catastrophes(ticks, m1Partial, 0.01).count() == 0)
  }

  test("T1/J4/U2: grid is dense+unique; gaps become flat candles; " +
    "leading gap rows are dropped (F4)") {
    val candles = Seq(
      (ts("2024-01-01 00:01:00"), 1.0, 1.2, 0.9, 1.1, 2L, 0.05),
      (ts("2024-01-01 00:04:00"), 1.1, 1.3, 1.0, 1.2, 3L, 0.07))
      .toDF("datetime", "open", "high", "low", "close", "volume", "spread")
    val grid = GridOps.minuteGrid(spark,
      ts("2024-01-01 00:00:00"), ts("2024-01-01 00:04:00"))
    assert(grid.count() == 5)
    assert(grid.distinct().count() == 5)
    val out = GridOps.flatCandleBridge(candles, grid)
      .orderBy("datetime").collect()
    // 00:00 is a leading gap (no prior close) → dropped
    assert(out.map(_.getTimestamp(0)).toSeq == Seq(
      ts("2024-01-01 00:01:00"), ts("2024-01-01 00:02:00"),
      ts("2024-01-01 00:03:00"), ts("2024-01-01 00:04:00")))
    val flats = out.filter(_.getAs[Int]("is_flat") == 1)
    assert(flats.map(_.getTimestamp(0)).toSeq == Seq(
      ts("2024-01-01 00:02:00"), ts("2024-01-01 00:03:00")))
    // is_flat=1 ⇒ volume=0 ∧ open=high=low=close=ffill(close) ∧ spread ffilled
    flats.foreach { r =>
      assert(r.getAs[Long]("volume") == 0L)
      assert(r.getAs[Double]("open") == 1.1)
      assert(r.getAs[Double]("high") == 1.1)
      assert(r.getAs[Double]("low") == 1.1)
      assert(r.getAs[Double]("close") == 1.1)
      assert(r.getAs[Double]("spread") == 0.05)
    }
    // real rows untouched
    assert(out.last.getAs[Double]("close") == 1.2)
    assert(out.last.getAs[Long]("volume") == 3L)
  }

  test("G5/U3: median fill; empty-spread input falls back to 0.0") {
    val df = Seq((1.0, null.asInstanceOf[java.lang.Double]))
      .toDF("x", "spread")
    assert(SpreadOps.medianSpread(df) == 0.0)
    val filled = SpreadOps.fillSpread(df, 0.123).head()
    assert(filled.getAs[Double]("spread") == 0.123)
  }

  test("P12: final cast produces float32 prices and int8 flag") {
    import org.apache.spark.sql.types._
    val df = Seq((ts("2024-01-01 00:00:00"), 1.0, 1.0, 1.0, 1.0, 1L, 0.01,
      1)).toDF("datetime", "open", "high", "low", "close", "volume",
      "spread", "is_flat")
    val cast = GridOps.finalCast(df)
    assert(cast.schema("open").dataType == FloatType)
    assert(cast.schema("volume").dataType == FloatType)
    assert(cast.schema("is_flat").dataType == ByteType)
  }
}
