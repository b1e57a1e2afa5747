package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{CleanOps, DayWindows, GridOps, WindowOps}

/** Equivalence of the day-partitioned window backends against the
  * global-window originals, on frames engineered to hit every boundary
  * case: days with 1, 2 and many rows, all-NULL days, NULL runs crossing
  * day boundaries, and frames spanning three days.
  */
class DayWindowsSpec extends SparkSpec {
  import spark.implicits._

  /** Frame with adversarial day shapes:
    *  day 1: 5 rows (nulls at head), day 2: ONE row (null),
    *  day 3: 2 rows, day 4: all-null 2 rows, day 5: 6 rows. */
  private def frame: DataFrame = Seq(
    ("2024-01-01 10:00:00", None: Option[Double]),
    ("2024-01-01 10:01:00", None),
    ("2024-01-01 10:02:00", Some(1.0)),
    ("2024-01-01 23:58:00", Some(2.0)),
    ("2024-01-01 23:59:00", None),
    ("2024-01-02 00:00:00", None), // single-row day, null
    ("2024-01-03 00:00:00", Some(5.0)),
    ("2024-01-03 23:59:00", None),
    ("2024-01-04 11:00:00", None), // all-null day
    ("2024-01-04 12:00:00", None),
    ("2024-01-05 00:00:00", Some(7.0)),
    ("2024-01-05 00:01:00", Some(3.0)),
    ("2024-01-05 00:02:00", None),
    ("2024-01-05 00:03:00", Some(9.0)),
    ("2024-01-05 00:04:00", Some(4.0)),
    ("2024-01-05 00:05:00", Some(6.0)))
    .map { case (t, v) => (ts(t), v) }
    .toDF("datetime", "v")

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    rows(df.orderBy("datetime"))

  test("ffill: day-partitioned backend equals the global window") {
    val global = frame.withColumn("v", WindowOps.ffill(col("v")))
    val byDay = DayWindows.ffill(frame, Seq("v"))
      .select("datetime", "v")
    assert(sortedRows(byDay) == sortedRows(global))
  }

  test("ffill/lag1/rollingMedian5 with broadcastPatch=false (the " +
    "high-key-cardinality escape hatch) still equal the global window") {
    val gF = frame.withColumn("v", WindowOps.ffill(col("v")))
    val bF = DayWindows.ffill(frame, Seq("v"), broadcastPatch = false)
      .select("datetime", "v")
    assert(sortedRows(bF) == sortedRows(gF))
    val gL = frame.withColumn("lag_v", WindowOps.lag1(col("v")))
    val bL = DayWindows.lag1(frame, "v", "lag_v",
        broadcastPatch = false)
      .select("datetime", "v", "lag_v")
    assert(sortedRows(bL) == sortedRows(gL))
    val gM = frame.withColumn("med", WindowOps.rollingMedian5(col("v")))
    val bM = DayWindows.rollingMedian5(frame, "v", "med",
        broadcastPatch = false)
      .select("datetime", "v", "med")
    assert(sortedRows(bM) == sortedRows(gM))
  }

  test("lag1: day-partitioned backend equals the global window") {
    val global = frame.withColumn("lag_v", WindowOps.lag1(col("v")))
    val byDay = DayWindows.lag1(frame, "v", "lag_v")
      .select("datetime", "v", "lag_v")
    assert(sortedRows(byDay) == sortedRows(global))
  }

  test("rollingMedian5: day-partitioned backend equals the global window") {
    val global = frame.withColumn("med", WindowOps.rollingMedian5(col("v")))
    val byDay = DayWindows.rollingMedian5(frame, "v", "med")
      .select("datetime", "v", "med")
    assert(sortedRows(byDay) == sortedRows(global))
  }

  test("flatCandleBridgeByDay equals flatCandleBridge on a gappy grid") {
    val candles = Seq(
      ("2024-01-01 23:58:00", 1.0, 2.0, 0.5, 1.5, 10L, 0.01),
      ("2024-01-02 00:03:00", 2.0, 3.0, 1.5, 2.5, 20L, 0.02),
      ("2024-01-02 00:04:00", 3.0, 4.0, 2.5, 3.5, 30L, 0.03))
      .map { case (t, o, h, l, c, vol, sp) =>
        (ts(t), o, h, l, c, vol, sp)
      }
      .toDF("datetime", "open", "high", "low", "close", "volume", "spread")
    val grid = GridOps.minuteGrid(spark,
      ts("2024-01-01 23:55:00"), ts("2024-01-02 00:05:00"))
    val cols = Seq("datetime", "open", "high", "low", "close", "volume",
      "spread", "is_flat").map(col)
    val global = GridOps.flatCandleBridge(candles, grid).select(cols: _*)
    val byDay = GridOps.flatCandleBridgeByDay(candles, grid).select(cols: _*)
    assert(sortedRows(byDay) == sortedRows(global))
    // the bridge actually bridged: leading pre-history dropped, gaps flat
    assert(byDay.count() == 8) // 23:58 .. 00:05
    assert(byDay.filter(col("is_flat") === 1).count() == 5)
  }

  /** The adversarial frame replicated under two keys with DIFFERENT
    * values and one key missing days entirely — cross-day carries must
    * never leak across keys. */
  private def keyedFrame: DataFrame = {
    val a = frame.withColumn("sym", lit("A"))
    val b = frame
      .filter(col("datetime") < ts("2024-01-04 00:00:00")) // fewer days
      .withColumn("v", col("v") * 10)
      .withColumn("sym", lit("B"))
    a.unionByName(b)
  }

  private def sortedKeyed(df: DataFrame): Seq[Seq[Any]] =
    rows(df.orderBy("sym", "datetime"))

  test("keyed ffill: (key, day) backend equals the keyed window") {
    val global = keyedFrame.withColumn("v",
      WindowOps.ffill(col("v"), Seq("sym")))
    val byDay = DayWindows.ffill(keyedFrame, Seq("v"),
      Seq("datetime"), Seq("sym")).select("sym", "datetime", "v")
    assert(sortedKeyed(byDay) ==
      sortedKeyed(global.select("sym", "datetime", "v")))
  }

  test("keyed lag1: (key, day) backend equals the keyed window") {
    val global = keyedFrame.withColumn("lag_v",
      WindowOps.lag1(col("v"), Seq("sym")))
    val byDay = DayWindows.lag1(keyedFrame, "v", "lag_v",
      Seq("datetime"), Seq("sym"))
      .select("sym", "datetime", "v", "lag_v")
    assert(sortedKeyed(byDay) ==
      sortedKeyed(global.select("sym", "datetime", "v", "lag_v")))
  }

  test("keyed rollingMedian5: (key, day) backend equals the keyed " +
    "window") {
    val global = keyedFrame.withColumn("med",
      WindowOps.rollingMedian5(col("v"), Seq("sym")))
    val byDay = DayWindows.rollingMedian5(keyedFrame, "v", "med",
      Seq("datetime"), Seq("sym"))
      .select("sym", "datetime", "v", "med")
    assert(sortedKeyed(byDay) ==
      sortedKeyed(global.select("sym", "datetime", "v", "med")))
  }

  test("spikeFilterByDay equals spikeFilter across a day boundary") {
    // close spikes at the first row of day 2 relative to day 1's last row
    val candles = Seq(
      ("2024-01-01 23:58:00", 1.0, 1.1, 0.9, 1.0, 10L),
      ("2024-01-01 23:59:00", 1.0, 1.1, 0.9, 1.05, 10L),
      ("2024-01-02 00:00:00", 1.0, 1.1, 0.9, 9.0, 10L), // 8.6x jump
      ("2024-01-02 00:01:00", 9.0, 9.1, 8.9, 9.1, 10L))
      .map { case (t, o, h, l, c, vol) => (ts(t), o, h, l, c, vol) }
      .toDF("datetime", "open", "high", "low", "close", "volume")
    val global = CleanOps.spikeFilter(candles, 2.0)
    val byDay = CleanOps.spikeFilterByDay(candles, 2.0)
    assert(sortedRows(byDay) == sortedRows(global))
    // the cross-boundary spike was actually caught
    assert(!rows(byDay).exists(_.contains(ts("2024-01-02 00:00:00"))))
  }
}
