package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{FusionOps, Resample, SpreadOps, TickPrep}
import graft.streaming.{PipelineTail, StagedReplay, StreamingPipeline}

/** The end-to-end streaming hybrid pipeline (VERDICT r14 #2): the
  * reference's full `run()` as ONE continuous query — two windowed
  * aggregations, a consensus full-outer window join, and the
  * transformWithState ordered tail — replayed to convergence against
  * the BATCH `Pipeline.run` on identical inputs.
  *
  * The pure [[PipelineTail]] state machine is pinned separately
  * (truncated W1 windows, F5/U1/F6 sequencing, bridge flats) so a
  * parity failure localizes to either the chain logic or the
  * streaming plumbing. */
class StreamingPipelineSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------- pure chain

  private def fused(t: String, o: Double, h: Double, l: Double,
                    c: Double, v: Long, sp: Option[Double]) =
    PipelineTail.FusedRow(ts(t), o, h, l, c, v, sp)

  test("PipelineTail: W1 truncation at both frame edges matches the " +
    "centered min_periods=1 window") {
    // spreads 1,2,3,4,5 → centered medians: med(1,2,3)=2, med(1..4)=2.5,
    // med(1..5)=3, med(2..5)=3.5, med(3,4,5)=4
    var st = PipelineTail.empty
    val out = Seq.newBuilder[PipelineTail.CandleOut]
    val audit =
      scala.collection.mutable.ListBuffer.empty[PipelineTail.AuditRow]
    (1 to 5).foreach { i =>
      val (s2, o) = PipelineTail.push(st,
        fused(s"2024-01-02 10:0$i:00", 1, 1, 1, 1, 1L, Some(i.toDouble)),
        median = 99.0, spikeThr = 100.0, audit)
      st = s2; out ++= o
    }
    val (s3, o3) = PipelineTail.finish(st, spikeThr = 100.0, audit)
    out ++= o3
    assert(audit.isEmpty)
    val got = out.result().filter(_.is_flat == 0).map(_.spread.get)
    assert(got == Seq(2.0, 2.5, 3.0, 3.5, 4.0))
    assert(s3.pend1.isEmpty && s3.pend2.isEmpty)
  }

  test("PipelineTail: U3 median fill, F5 drop, U1 widen+punch+ffill, " +
    "F6 lag over survivors, bridge flats") {
    var st = PipelineTail.empty
    val out = Seq.newBuilder[PipelineTail.CandleOut]
    val thr = 0.25
    val rows = Seq(
      // normal row, null spread → median (0.5); amp (11-9)/10 = 0.2 ok
      fused("2024-01-02 10:00:00", 10, 11, 9, 10, 5L, None),
      // inverted (low > high): F5 drops it entirely
      fused("2024-01-02 10:01:00", 10, 9, 11, 10, 5L, Some(0.5)),
      // structural: close 11.4 > high 11 → widen high to 11.4, punch
      // spread → ffilled 0.5; amp (11.4-9)/10 = 0.24 still ok
      fused("2024-01-02 10:02:00", 10, 11, 9, 11.4, 5L, Some(0.5)),
      // pct spike: |14.4/11.4 - 1| ≈ 0.263 > 0.25 → F6 drop
      // (amp (14.5-13.8)/14 = 0.05 ok, no structural breach)
      fused("2024-01-02 10:03:00", 14, 14.5, 13.8, 14.4, 5L, Some(0.5)),
      // calm vs lag 14.4 (F6's lag advanced through the dropped row);
      // 3 minutes after the last survivor → flats at 10:03, 10:04
      fused("2024-01-02 10:05:00", 14, 14.2, 13.9, 14.0, 5L, Some(0.5)))
    val audit =
      scala.collection.mutable.ListBuffer.empty[PipelineTail.AuditRow]
    rows.foreach { r =>
      val (s2, o) = PipelineTail.push(st, r, 0.5, thr, audit)
      st = s2; out ++= o
    }
    val (_, of) = PipelineTail.finish(st, thr, audit)
    out ++= of
    // the audit tape records each anomaly with its stage's values
    assert(audit.map(a => (new java.sql.Timestamp(a.minuteMs),
      a.reason)).toList == List(
      (ts("2024-01-02 10:01:00"), "dropped_inverted"),
      (ts("2024-01-02 10:02:00"), "fixed_structure_integrity"),
      (ts("2024-01-02 10:03:00"), "dropped_volatility_spike")))
    val got = out.result()
    val real = got.filter(_.is_flat == 0)
    val flats = got.filter(_.is_flat == 1)
    assert(real.map(_.datetime) ==
      Seq(ts("2024-01-02 10:00:00"), ts("2024-01-02 10:02:00"),
        ts("2024-01-02 10:05:00")), got)
    // 10:02 was widened and its spread punched → ffilled 0.5
    val repaired = real(1)
    assert(repaired.high == 11.4 && repaired.spread.contains(0.5))
    // the F5-dropped minute bridges too (close 10 from 10:00), then
    // two flats at 10:03, 10:04 inherit the repaired close 11.4
    assert(flats.map(f => (f.datetime, f.close)) == Seq(
      (ts("2024-01-02 10:01:00"), 10.0),
      (ts("2024-01-02 10:03:00"), 11.4),
      (ts("2024-01-02 10:04:00"), 11.4)))
    assert(flats.forall(f => f.open == f.close && f.volume == 0L &&
      f.spread.contains(0.5)))
  }

  test("weekdaySentinelMs lands on a Wednesday 12:00 UTC at/after " +
    "the floor — never inside the F2 closure band") {
    val fmt = java.time.format.DateTimeFormatter.ISO_INSTANT
    Seq(
      ts("2024-01-05 23:00:00"), // Friday night
      ts("2024-01-06 03:00:00"), // Saturday
      ts("2024-01-07 10:00:00"), // Sunday morning
      ts("2024-01-10 12:00:00"), // Wednesday noon exactly
      ts("2024-01-10 12:00:01")  // just past Wednesday noon
    ).foreach { t =>
      val ms = StreamingPipeline.weekdaySentinelMs(t.getTime)
      assert(ms >= t.getTime)
      val inst = java.time.Instant.ofEpochMilli(ms)
      val z = inst.atZone(java.time.ZoneOffset.UTC)
      assert(z.getDayOfWeek == java.time.DayOfWeek.WEDNESDAY &&
        z.getHour == 12 && z.getMinute == 0,
        s"${fmt.format(inst)} for floor $t")
    }
  }

  // ------------------------------------------------ composed-query parity

  /** Raw ticks: a Tuesday; minute layout exercises catastrophe
    * rejection (10:01), an M1-backfilled gap (10:02 + median fill),
    * an F6 spike (10:06), a 3-minute bridge gap, and an m1-only tail
    * minute extending the frame. */
  private def fixture(): (DataFrame, DataFrame) = {
    def tick(t: String, id: Long, mid: Double, spread: Double) =
      (ts(t), id, mid + spread / 2, mid - spread / 2)
    val ticks = Seq(
      tick("2024-01-02 10:00:05", 1, 1.10, 0.010),
      tick("2024-01-02 10:00:35", 2, 1.12, 0.012),
      tick("2024-01-02 10:01:05", 3, 9.00, 0.010), // catastrophe vs m1
      tick("2024-01-02 10:03:05", 4, 1.13, 0.014),
      tick("2024-01-02 10:04:05", 5, 1.14, 0.010),
      tick("2024-01-02 10:06:05", 6, 2.50, 0.010), // F6 spike
      tick("2024-01-02 10:07:05", 7, 1.15, 0.016),
      tick("2024-01-02 10:11:05", 8, 1.16, 0.010), // after a 3-min gap
      tick("2024-01-02 10:12:35", 9, 1.17, 0.012)
    ).toDF("datetime", "tick_id", "ask", "bid")
    val m1rows = Seq(
      (ts("2024-01-02 10:01:10"), 101L, 1.11),
      (ts("2024-01-02 10:02:10"), 102L, 1.12), // m1-only minute
      (ts("2024-01-02 10:04:10"), 103L, 1.99), // tick wins (present)
      (ts("2024-01-02 10:14:10"), 104L, 1.18)  // m1-only tail minute
    ).toDF("datetime", "tick_id", "mid")
      .withColumn("spread", lit(null).cast("double"))
    (ticks, m1rows)
  }

  private def gateSelect(df: DataFrame): DataFrame =
    df.select(col("datetime"),
      Rounding.duckRound(col("open").cast("float").cast("double"), 5)
        .as("open"),
      Rounding.duckRound(col("high").cast("float").cast("double"), 5)
        .as("high"),
      Rounding.duckRound(col("low").cast("float").cast("double"), 5)
        .as("low"),
      Rounding.duckRound(col("close").cast("float").cast("double"), 5)
        .as("close"),
      col("volume").cast("float").cast("double").as("volume"),
      Rounding.duckRound(col("spread").cast("float").cast("double"), 5)
        .as("spread"),
      col("is_flat").cast("int").as("is_flat"))

  test("KEYED composed streaming pipeline == batch keyed Pipeline.run " +
    "(per-sym state, trailing flats to the global grid end)") {
    val (ticks0, m10) = fixture()
    def keyedCopy(df: DataFrame) =
      df.withColumn("sym", lit(0L)).unionByName(
        df.withColumn("datetime",
            col("datetime") + expr("INTERVAL 1 HOUR"))
          .withColumn("tick_id", col("tick_id") + 100)
          .withColumn("sym", lit(1L)))
    // sym 1 = the same series shifted +1h → different per-sym spans,
    // so sym 0 must bridge trailing flats to the GLOBAL grid end
    val kticks = keyedCopy(ticks0)
    val km1rows = keyedCopy(m10)
    val km1 = Resample.ohlc1min(km1rows, Seq("sym"))
    val spikeThr = 0.10
    val consThr = 1.0
    val batch = Pipeline.run(spark, kticks, Some(km1), spikeThr,
      consThr, partitionBy = Seq("sym"))
    def keySelect(df: DataFrame) = df.select(col("sym"),
      col("datetime"),
      Rounding.duckRound(col("open").cast("float").cast("double"), 5)
        .as("open"),
      Rounding.duckRound(col("high").cast("float").cast("double"), 5)
        .as("high"),
      Rounding.duckRound(col("low").cast("float").cast("double"), 5)
        .as("low"),
      Rounding.duckRound(col("close").cast("float").cast("double"), 5)
        .as("close"),
      col("volume").cast("float").cast("double").as("volume"),
      Rounding.duckRound(col("spread").cast("float").cast("double"), 5)
        .as("spread"),
      col("is_flat").cast("int").as("is_flat"))
    val want = rows(keySelect(batch.candles)
      .orderBy(col("sym"), col("datetime")))

    // global parameters, batch-exact (the replay-adapter contract)
    val keys = Seq("sym", "datetime")
    val tCand = Resample.ohlc1min(graft.ops.TickPrep(kticks), Seq("sym"))
    val fusedB = FusionOps.combineFirst(
      FusionOps.rejectCatastrophes(tCand,
        FusionOps.catastrophes(tCand, km1, consThr, keys), keys),
      km1, keys)
    val med = SpreadOps.medianSpread(fusedB)
    val validated = graft.ops.CleanOps.spikeFilter(
      graft.ops.CleanOps.structuralRepair(
        graft.ops.CleanOps.dropInverted(SpreadOps(fusedB, Seq("sym"))),
        Seq("sym")),
      spikeThr, Seq("sym"))
    val bridgeEnd = Math.floorDiv(
      validated.agg(max(col("datetime"))).head()
        .getTimestamp(0).getTime, 60000L)

    val mx = validated.agg(max(col("datetime"))).head()
      .getTimestamp(0).getTime
    val delayMin = 10000L
    val flush = new java.sql.Timestamp(
      StreamingPipeline.weekdaySentinelMs(
        mx + (delayMin + 1440) * 60000L))
    val flushFireMs = mx + 10 * 60000L
    def sentinel(df: DataFrame) =
      df.limit(1).withColumn("datetime", lit(flush))
    val tDir = StagedReplay.stageFiles(Seq(
      kticks.filter(minute(col("datetime")) % 3 =!= 2),
      kticks.filter(minute(col("datetime")) % 3 === 2),
      sentinel(kticks)), "target/test-fixtures/spk_ticks")
    val mDir = StagedReplay.stageFiles(Seq(
      km1rows.filter(minute(col("datetime")) % 4 =!= 1),
      km1rows.filter(minute(col("datetime")) % 4 === 1),
      sentinel(km1rows)), "target/test-fixtures/spk_m1")
    def stream(p: String) = spark.readStream
      .schema(spark.read.parquet(p).schema)
      .option("maxFilesPerTrigger", "1").parquet(p)

    val result = StreamingPipeline.runKeyed(
      graft.ops.TickPrep(stream(tDir)), stream(mDir),
      s"$delayMin minutes", med, spikeThr, consThr,
      cutoffMs = flushFireMs, flushFireMs = flushFireMs,
      bridgeEndMin = bridgeEnd)
    val replayed = StreamingPipeline.replayWithRocksDb(
      spark, result, 4)
    val got = rows(keySelect(replayed)
      .orderBy(col("sym"), col("datetime")))
    assert(got == want)
  }

  test("tail state is WATERMARK-BOUNDED, not replay-length-bounded: " +
    "an 8-batch ordered replay never buffers more than delay+span " +
    "candles and drains to zero at the flush (VERDICT r15 #5)") {
    import graft.streaming.PipelineTailObserver
    // 32 minutes of one-tick-per-minute data (Tue, inside trading
    // hours), staged as 8 in-order files of 4 minutes each; watermark
    // delay 2 minutes → at any settle the tail may hold at most the
    // unsettled trailing window (delay + current batch span + the
    // one-batch boundary lag), NEVER the whole replay.
    val nMin = 32
    val batchSpan = 4
    val delayMin = 2
    val t0 = ts("2024-01-02 10:00:00").getTime
    val ticks = (0 until nMin).map { i =>
      (new java.sql.Timestamp(t0 + i * 60000L + 5000L), i.toLong + 1,
        1.10 + (i % 5) * 0.001, 1.09 + (i % 5) * 0.001)
    }.toDF("datetime", "tick_id", "ask", "bid")
    val m1rows = (0 until nMin).map { i =>
      (new java.sql.Timestamp(t0 + i * 60000L + 10000L),
        100L + i, 1.095 + (i % 5) * 0.001)
    }.toDF("datetime", "tick_id", "mid")
      .withColumn("spread", lit(null).cast("double"))

    val mx = t0 + (nMin - 1) * 60000L + 10000L
    val flushFireMs = mx + 10 * 60000L
    val flush = new java.sql.Timestamp(
      StreamingPipeline.weekdaySentinelMs(
        flushFireMs + (delayMin + 1440) * 60000L))
    def sentinel(df: DataFrame) =
      df.limit(1).withColumn("datetime", lit(flush))
    def batches(df: DataFrame) = (0 until nMin / batchSpan).map { b =>
      df.filter(col("datetime") >=
        new java.sql.Timestamp(t0 + b * batchSpan * 60000L) &&
        col("datetime") <
          new java.sql.Timestamp(t0 + (b + 1) * batchSpan * 60000L))
    } :+ sentinel(df)
    val tDir = StagedReplay.stageFiles(batches(ticks),
      "target/test-fixtures/spb_ticks")
    val mDir = StagedReplay.stageFiles(batches(m1rows),
      "target/test-fixtures/spb_m1")
    def stream(p: String) = spark.readStream
      .schema(spark.read.parquet(p).schema)
      .option("maxFilesPerTrigger", "1").parquet(p)

    PipelineTailObserver.reset()
    PipelineTailObserver.enabled = true
    try {
      val result = StreamingPipeline.run(
        TickPrep(stream(tDir)), stream(mDir), s"$delayMin minutes",
        0.01, 100.0, 1.0, cutoffMs = flushFireMs,
        flushFireMs = flushFireMs)
      val replayed =
        StreamingPipeline.replayWithRocksDb(spark, result, 1)
      assert(replayed.count() == nMin) // no gaps: every minute real
    } finally PipelineTailObserver.enabled = false

    val samples = PipelineTailObserver.samples()
    // the replay really settled incrementally (many firings), not in
    // one end-of-data drain
    assert(samples.size >= 6, s"expected >=6 settles, got $samples")
    // candle rate = 1/min here, so rows == minutes: the buffer may
    // hold the unsettled trailing window (delay + batch span + one
    // batch of boundary lag ≈ 2+4+4+2) but NEVER the 32-minute replay
    val bound = delayMin + 2 * batchSpan + 2
    val maxBefore = samples.map(_._2).max
    assert(maxBefore <= bound,
      s"buffer peaked at $maxBefore rows (> $bound): state is " +
        s"accumulating with replay length; samples=$samples")
    samples.filterNot(_._4).foreach { case (_, _, after, _) =>
      assert(after <= delayMin + batchSpan + 2,
        s"post-settle buffer $after exceeds the watermark window; " +
          s"samples=$samples")
    }
    // the end-of-replay flush drains the buffer completely
    val flushes = samples.filter(_._4)
    assert(flushes.nonEmpty && flushes.forall(_._3 == 0),
      s"flush did not drain: $samples")
  }

  test("composed streaming pipeline == batch Pipeline.run on a staged " +
    "multi-batch replay") {
    val (ticks, m1rows) = fixture()
    val spikeThr = 0.10
    val consThr = 1.0

    // batch twin (the oracle)
    val m1Candles = Resample.ohlc1min(m1rows)
    val batch = Pipeline.run(spark, ticks, Some(m1Candles),
      spikeThr, consThr)
    val want = rows(gateSelect(batch.candles.select(
      col("datetime"), col("open"), col("high"), col("low"),
      col("close"), col("volume"), col("spread"),
      col("is_flat"))).orderBy(col("datetime")))

    // streaming parameters: batch-exact median (the documented
    // two-pass parameterization), sentinel/flush bookkeeping
    val tCand = Resample.ohlc1min(TickPrep(ticks))
    val cata = FusionOps.catastrophes(tCand, m1Candles, consThr)
    val fusedBatch = FusionOps.combineFirst(
      FusionOps.rejectCatastrophes(tCand, cata), m1Candles)
    val med = SpreadOps.medianSpread(fusedBatch)

    val mx = ts("2024-01-02 10:14:10").getTime
    val delayMin = 10000L
    val flush = new java.sql.Timestamp(
      mx + (delayMin + 1440) * 60000L)
    val flushFireMs = mx + 10 * 60000L
    def sentinel(df: DataFrame) =
      df.limit(1).withColumn("datetime", lit(flush))

    // staged with cross-batch disorder on both sides
    val tDir = StagedReplay.stageFiles(Seq(
      ticks.filter(minute(col("datetime")) % 3 =!= 2),
      ticks.filter(minute(col("datetime")) % 3 === 2),
      sentinel(ticks)), "target/test-fixtures/sp_ticks")
    val mDir = StagedReplay.stageFiles(Seq(
      m1rows.filter(minute(col("datetime")) % 4 =!= 1),
      m1rows.filter(minute(col("datetime")) % 4 === 1),
      sentinel(m1rows)), "target/test-fixtures/sp_m1")
    def stream(p: String) = spark.readStream
      .schema(spark.read.parquet(p).schema)
      .option("maxFilesPerTrigger", "1").parquet(p)

    val result = StreamingPipeline.run(
      TickPrep(stream(tDir)), stream(mDir), s"$delayMin minutes",
      med, spikeThr, consThr, cutoffMs = flushFireMs,
      flushFireMs = flushFireMs)
    val got = rows(gateSelect(
      StreamingPipeline.replayWithRocksDb(spark, result, 4))
      .orderBy(col("datetime")))

    assert(got == want)
  }
}
