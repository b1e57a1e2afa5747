package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, FloatType}

/** End-to-end Pipeline.run on a hand-built two-feed scenario covering
  * consensus rejection, fusion fallback, gap bridging, and the float32
  * output contract. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("pipeline fuses feeds, bridges gaps, rejects catastrophes, and " +
    "casts to the reference's output schema") {
    // Tick feed: Wed 2024-01-03, minutes 10:00, 10:01, 10:04
    //  - 10:01 will be a catastrophe (tick close 9.0 vs m1 close 1.0)
    val ticks = Seq(
      (ts("2024-01-03 10:00:10"), 1L, 1.005, 0.995),
      (ts("2024-01-03 10:00:50"), 2L, 1.015, 1.005),
      (ts("2024-01-03 10:01:10"), 3L, 9.005, 8.995),
      (ts("2024-01-03 10:04:30"), 4L, 1.025, 1.015))
      .toDF("datetime", "tick_id", "ask", "bid")
    // M1 feed: has 10:01 (sane) and 10:02 (tick-missing minute)
    val m1 = Seq(
      (ts("2024-01-03 10:01:00"), 1.0, 1.01, 0.99, 1.0, 5L,
        null.asInstanceOf[java.lang.Double]),
      (ts("2024-01-03 10:02:00"), 1.01, 1.02, 1.0, 1.01, 4L,
        null.asInstanceOf[java.lang.Double]))
      .toDF("datetime", "open", "high", "low", "close", "volume", "spread")

    val r = Pipeline.run(spark, ticks, Some(m1),
      spikeThreshold = 0.5, consensusThreshold = 0.5)
    val out = r.candles.orderBy("datetime").collect()

    // dense minutes 10:00..10:04, all present
    assert(out.map(_.getTimestamp(0)).toSeq ==
      (0 to 4).map(m => ts(f"2024-01-03 10:0$m%d:00")))
    // catastrophe minute 10:01 lost its tick candle; M1 filled it
    val m01 = out(1)
    assert(math.abs(m01.getAs[Float]("close") - 1.0f) < 1e-6)
    // 10:02 came from M1 (tick feed had nothing)
    assert(math.abs(out(2).getAs[Float]("close") - 1.01f) < 1e-6)
    // 10:03 is a bridged flat candle inheriting 10:02's close
    val m03 = out(3)
    assert(m03.getAs[Byte]("is_flat") == 1.toByte)
    assert(m03.getAs[Float]("volume") == 0f)
    assert(m03.getAs[Float]("open") == m03.getAs[Float]("close"))
    // output schema: float32 prices/volume/spread, int8 flag
    assert(r.candles.schema("close").dataType == FloatType)
    assert(r.candles.schema("is_flat").dataType == ByteType)
    // spread is fully recovered (non-null everywhere)
    assert(out.forall(!_.isNullAt(r.candles.columns.indexOf("spread"))))

    // audit log carries the catastrophe rejection and the flat bridge
    val reasons = r.audit.select("reason").as[String].collect().toSet
    assert(reasons.contains("rejected_tick_catastrophe"))
    assert(reasons.contains("gap_bridged_flat"))
    r.release()
  }

  test("pipeline generalizes to multi-symbol inputs via partitionBy " +
    "(per-key grids, windows, and joins)") {
    val ticks = Seq(
      ("EURUSD", ts("2024-01-03 10:00:10"), 1L, 1.005, 0.995),
      ("EURUSD", ts("2024-01-03 10:02:30"), 2L, 1.015, 1.005),
      ("GBPUSD", ts("2024-01-03 10:01:05"), 3L, 2.005, 1.995),
      ("GBPUSD", ts("2024-01-03 10:03:40"), 4L, 2.015, 2.005))
      .toDF("sym", "datetime", "tick_id", "ask", "bid")
    val r = Pipeline.run(spark, ticks, None, spikeThreshold = 0.5,
      partitionBy = Seq("sym"))
    val out = r.candles
    // keyed audit rows carry the symbol so anomalies are attributable
    assert(r.audit.columns.contains("sym"))
    assert(r.audit.filter(col("reason") === "gap_bridged_flat")
      .select("sym").distinct().count() == 2)
    val bySym = out.collect().groupBy(_.getAs[String]("sym"))
    // each symbol gets the full shared grid span (10:00..10:03), with
    // leading pre-history rows dropped per symbol
    assert(bySym("EURUSD").map(_.getTimestamp(1)).sorted.toSeq ==
      (0 to 3).map(m => ts(s"2024-01-03 10:0$m:00")))
    assert(bySym("GBPUSD").map(_.getTimestamp(1)).sorted.toSeq ==
      (1 to 3).map(m => ts(s"2024-01-03 10:0$m:00")))
    // ffill never crosses symbols: GBPUSD's flats inherit GBPUSD closes
    val gbpFlat = bySym("GBPUSD")
      .filter(_.getAs[Byte]("is_flat") == 1.toByte)
    assert(gbpFlat.forall(r =>
      math.abs(r.getAs[Float]("close") - 2.0f) < 0.01f))
    r.release()
  }

  test("dayWindows backend composes into the pipeline: identical candles " +
    "and audit, windows crossing day boundaries included") {
    // ticks span THREE days with day-boundary-adjacent minutes so every
    // DayWindows carry path (ffill, lag, rolling-median edge strip) is
    // exercised, plus a catastrophe and a structural violation via m1
    val ticks = Seq(
      (ts("2024-01-02 23:57:10"), 1L, 1.005, 0.995),
      (ts("2024-01-02 23:58:20"), 2L, 1.015, 1.005),
      (ts("2024-01-02 23:59:30"), 3L, 1.025, 1.015),
      (ts("2024-01-03 00:00:40"), 4L, 1.035, 1.025),
      (ts("2024-01-03 00:01:50"), 5L, 9.005, 8.995), // catastrophe vs m1
      (ts("2024-01-03 00:04:15"), 6L, 1.045, 1.035), // gap 00:02-00:03
      (ts("2024-01-04 00:01:05"), 7L, 1.055, 1.045)) // next-day gap run
      .toDF("datetime", "tick_id", "ask", "bid")
    val m1 = Seq(
      (ts("2024-01-03 00:01:00"), 1.03, 1.04, 1.02, 1.03, 5L,
        null.asInstanceOf[java.lang.Double]),
      (ts("2024-01-03 00:02:00"), 1.04, 1.03, 1.05, 1.04, 4L,
        null.asInstanceOf[java.lang.Double])) // inverted: high<low → U1/F5
      .toDF("datetime", "open", "high", "low", "close", "volume", "spread")

    val global = Pipeline.run(spark, ticks, Some(m1),
      spikeThreshold = 0.5, consensusThreshold = 0.5)
    val byDay = Pipeline.run(spark, ticks, Some(m1),
      spikeThreshold = 0.5, consensusThreshold = 0.5, dayWindows = true)

    def key(df: org.apache.spark.sql.DataFrame) = df.orderBy("datetime")
      .collect().map(_.toSeq).toSeq
    assert(key(byDay.candles.orderBy("datetime")) ==
      key(global.candles.orderBy("datetime")))
    assert(byDay.audit.orderBy("datetime", "reason").collect().map(_.toSeq)
      .toSeq ==
      global.audit.orderBy("datetime", "reason").collect().map(_.toSeq)
        .toSeq)
    // sanity: the scenario really has flats that cross a day boundary
    assert(byDay.candles.filter(col("is_flat") === 1).count() > 1000)
    global.release(); byDay.release()
  }

  test("dayWindows composes with partitionBy: keyed (key, day) run " +
    "equals the plain keyed run across a day boundary") {
    // two symbols, one crossing a day boundary with a minute gap so
    // the keyed carry paths (ffill/lag/median edge strip) all engage;
    // the other confined to one day — carries must not leak across
    // either boundary (day or key)
    val ticks = Seq(
      ("EURUSD", ts("2024-01-02 23:58:10"), 1L, 1.005, 0.995),
      ("EURUSD", ts("2024-01-02 23:59:20"), 2L, 1.015, 1.005),
      ("EURUSD", ts("2024-01-03 00:01:30"), 3L, 1.025, 1.015),
      ("GBPUSD", ts("2024-01-03 00:00:05"), 4L, 2.005, 1.995),
      ("GBPUSD", ts("2024-01-03 00:02:40"), 5L, 2.015, 2.005))
      .toDF("sym", "datetime", "tick_id", "ask", "bid")
    val plain = Pipeline.run(spark, ticks, None, spikeThreshold = 0.5,
      partitionBy = Seq("sym"))
    val byDay = Pipeline.run(spark, ticks, None, spikeThreshold = 0.5,
      partitionBy = Seq("sym"), dayWindows = true)
    val cols = Seq("sym", "datetime", "open", "high", "low", "close",
      "volume", "spread", "is_flat")
    def sorted(df: org.apache.spark.sql.DataFrame) =
      rows(df.select(cols.map(col): _*).orderBy("sym", "datetime"))
    assert(sorted(byDay.candles) == sorted(plain.candles))
    assert(rows(byDay.audit.orderBy("sym", "datetime", "reason")) ==
      rows(plain.audit.orderBy("sym", "datetime", "reason")))
    plain.release(); byDay.release()
  }

  test("MIXED backend (W1 day, ffill/lag/bridge global) equals the " +
    "global run: candles and audit, day-boundary windows included") {
    // same three-day fixture as the all-day parity test: the W1 edge
    // strip engages across both day boundaries while the ffill/lag/
    // bridge stages run on the global backend — the measured-best
    // large-span shape (VERDICT r15 #1)
    val ticks = Seq(
      (ts("2024-01-02 23:57:10"), 1L, 1.005, 0.995),
      (ts("2024-01-02 23:58:20"), 2L, 1.015, 1.005),
      (ts("2024-01-02 23:59:30"), 3L, 1.025, 1.015),
      (ts("2024-01-03 00:00:40"), 4L, 1.035, 1.025),
      (ts("2024-01-03 00:01:50"), 5L, 9.005, 8.995),
      (ts("2024-01-03 00:04:15"), 6L, 1.045, 1.035),
      (ts("2024-01-04 00:01:05"), 7L, 1.055, 1.045))
      .toDF("datetime", "tick_id", "ask", "bid")
    val m1 = Seq(
      (ts("2024-01-03 00:01:00"), 1.03, 1.04, 1.02, 1.03, 5L,
        null.asInstanceOf[java.lang.Double]),
      (ts("2024-01-03 00:02:00"), 1.04, 1.03, 1.05, 1.04, 4L,
        null.asInstanceOf[java.lang.Double]))
      .toDF("datetime", "open", "high", "low", "close", "volume", "spread")
    val global = Pipeline.run(spark, ticks, Some(m1),
      spikeThreshold = 0.5, consensusThreshold = 0.5)
    val mixed = Pipeline.run(spark, ticks, Some(m1),
      spikeThreshold = 0.5, consensusThreshold = 0.5,
      w1Day = Some(true))
    assert(rows(mixed.candles.orderBy("datetime")) ==
      rows(global.candles.orderBy("datetime")))
    assert(rows(mixed.audit.orderBy("datetime", "reason")) ==
      rows(global.audit.orderBy("datetime", "reason")))
    global.release(); mixed.release()
  }

  test("autoWindows dispatches by the measured three-regime rule and " +
    "explicit overrides win") {
    assert(Pipeline.chooseBackends(500000L) == (false, false))
    assert(Pipeline.chooseBackends(2800000L) == (true, false))
    assert(Pipeline.chooseBackends(28000000L) == (true, true))
    // boundary values land on the larger-data regime's side
    assert(Pipeline.chooseBackends(1000000L) == (true, false))
    assert(Pipeline.chooseBackends(10000000L) == (true, true))
    // precedence (ADVICE r16): an explicit dayWindows = true beats
    // autoWindows — auto must never silently discard a requested
    // all-day run; per-stage overrides beat both
    assert(Pipeline.resolveBackends(500000L, dayWindows = true,
      autoWindows = true, None, None) == (true, true))
    assert(Pipeline.resolveBackends(2800000L, dayWindows = false,
      autoWindows = true, None, None) == (true, false))
    assert(Pipeline.resolveBackends(2800000L, dayWindows = false,
      autoWindows = true, w1Day = Some(false), fillLagDay = Some(true))
      == (false, true))
    // a non-auto, non-day call never evaluates the row count at all
    assert(Pipeline.resolveBackends(
      throw new IllegalStateException("rows must stay lazy"),
      dayWindows = false, autoWindows = false, None, None)
      == (false, false))
    // an auto run at fixture scale equals the explicit global run
    val ticks = Seq(
      (ts("2024-01-03 10:00:10"), 1L, 1.005, 0.995),
      (ts("2024-01-03 10:02:30"), 2L, 1.015, 1.005))
      .toDF("datetime", "tick_id", "ask", "bid")
    val auto = Pipeline.run(spark, ticks, None, spikeThreshold = 0.5,
      autoWindows = true)
    val explicit = Pipeline.run(spark, ticks, None,
      spikeThreshold = 0.5)
    assert(rows(auto.candles.orderBy("datetime")) ==
      rows(explicit.candles.orderBy("datetime")))
    auto.release(); explicit.release()
  }

  test("keyed auto-dispatch follows the DOMINANT key's span, not the " +
    "total (VERDICT r16 #1)") {
    // one dominant key with 15 rows + ten small keys with 2 each:
    // the keyed-window straggler is the dominant key's 15, even
    // though the frame totals 35 rows
    val candles = (1 to 15).map(i => ("BIG", i.toLong)) ++
      (for (k <- 1 to 10; i <- 1 to 2)
        yield (s"S$k", (100 * k + i).toLong))
    val df = candles.toDF("sym", "tick_id")
    assert(Pipeline.dispatchRows(df, Seq("sym")) == 15L)
    assert(Pipeline.dispatchRows(df, Nil) == 35L)
    // an EMPTY keyed frame has zero groups → max(count) is a NULL
    // scalar: dispatch must degrade to 0 (the global regime), not NPE
    // (ADVICE r17)
    val empty = df.filter(org.apache.spark.sql.functions.lit(false))
    assert(Pipeline.dispatchRows(empty, Seq("sym")) == 0L)
    assert(Pipeline.dispatchRows(empty, Nil) == 0L)
    // an auto keyed run at fixture scale equals the explicit keyed
    // global run (every key below the 1 M regime boundary)
    val ticks = Seq(
      ("EURUSD", ts("2024-01-03 10:00:10"), 1L, 1.005, 0.995),
      ("EURUSD", ts("2024-01-03 10:02:30"), 2L, 1.015, 1.005),
      ("GBPUSD", ts("2024-01-03 10:01:05"), 3L, 2.005, 1.995))
      .toDF("sym", "datetime", "tick_id", "ask", "bid")
    val auto = Pipeline.run(spark, ticks, None, spikeThreshold = 0.5,
      partitionBy = Seq("sym"), autoWindows = true)
    val explicit = Pipeline.run(spark, ticks, None,
      spikeThreshold = 0.5, partitionBy = Seq("sym"))
    assert(rows(auto.candles.orderBy("sym", "datetime")) ==
      rows(explicit.candles.orderBy("sym", "datetime")))
    auto.release(); explicit.release()
  }

  test("pipeline without an M1 feed degrades to the pure tick path") {
    val ticks = Seq(
      (ts("2024-01-03 10:00:10"), 1L, 1.005, 0.995),
      (ts("2024-01-03 10:02:30"), 2L, 1.015, 1.005))
      .toDF("datetime", "tick_id", "ask", "bid")
    val res = Pipeline.run(spark, ticks, None, spikeThreshold = 0.5)
    val out = res.candles.orderBy("datetime").collect()
    assert(out.length == 3)
    assert(out(1).getAs[Byte]("is_flat") == 1.toByte)
    res.release()
  }
}
