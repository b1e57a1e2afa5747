package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops._

/** Driver contract — one named query per implemented operator from
  * SURVEY.md §2 (see COVERAGE.md for the §2-id → query-name map), each with
  * a DuckDB oracle twin in [[oracleSql]].
  *
  * Conventions for exact cross-engine parity:
  *  - floating-point results of accumulation-order-dependent arithmetic
  *    (sums/averages/medians) are rounded to 6 decimals on BOTH sides;
  *    identical scalar expression trees are bit-identical and need none;
  *  - oracle literals are CAST to DOUBLE (DuckDB parses bare `0.01` as
  *    DECIMAL, which rounds differently from Spark's double literals);
  *  - two synthetic feeds stand in for the reference's two inputs
  *    (`hybrid_merger.py:42-74`): the full event stream as the tick feed
  *    and a click/view-only per-minute aggregate as the legacy "M1" feed.
  */
object SparkEntry {

  // ---------------------------------------------------------------- Spark
  private def tickCandles(s: SparkSession, dir: String): DataFrame =
    Resample.ohlc1min(TickPrep(Tables.ticks(s, dir)))

  /** Legacy "M1" feed: per-minute candles over click/view events only —
    * no weekend filter (a legacy history covers hours the live tick feed
    * drops), no spread (the reference's M1 has `spread = NaN`,
    * `hybrid_merger.py:52`). */
  private def m1Candles(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .filter(col("event_type").isin("click", "view"))
      .select(col("ts").as("datetime"), col("event_id").as("tick_id"),
        col("value").as("mid"), lit(null).cast("double").as("spread"))
    Resample.ohlc1min(ev)
  }

  /** Candles with deliberately mismatched high/low (high from clicks,
    * low from views) so the structural-integrity operators F5/U1 have
    * real violations to act on. */
  private def mixedCandles(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .groupBy(date_trunc("minute", col("ts")).as("datetime"))
      .agg(
        Resample.firstBy(col("value"), col("ts"), col("event_id")).as("open"),
        max(when(col("event_type") === "click", col("value"))).as("high"),
        min(when(col("event_type") === "view", col("value"))).as("low"),
        Resample.lastBy(col("value"), col("ts"), col("event_id")).as("close"),
        count(lit(1)).as("volume"))
      .filter(col("high").isNotNull && col("low").isNotNull)

  private def gridOf(s: SparkSession, candles: DataFrame): DataFrame = {
    val b = candles.agg(min(col("datetime")), max(col("datetime"))).head()
    if (b.isNullAt(0)) // empty candle frame → empty grid, not an NPE
      s.range(0).select(timestamp_millis(col("id")).as("datetime"))
    else GridOps.minuteGrid(s, b.getTimestamp(0), b.getTimestamp(1))
  }

  /** Per-user minute candles from the events feed plus each user's
    * bounded slice of ONE global distributed minute grid (broadcast
    * bounds range-join) — the shared input of the u2_bridge_by_key
    * variants. */
  private def keyedCandlesAndGrid(s: SparkSession,
                                  dir: String): (DataFrame, DataFrame) = {
    val ev = Tables.load(s, dir, "events").filter(col("user_id") < 10)
    val candles = Resample.ohlc1min(
      ev.select(col("ts").as("datetime"), col("event_id").as("tick_id"),
        col("user_id"), col("value").as("mid"),
        lit(null).cast("double").as("spread")),
      Seq("user_id"))
    val bounds = candles.groupBy(col("user_id"))
      .agg(min(col("datetime")).as("mn"), max(col("datetime")).as("mx"))
    val g = bounds.agg(min(col("mn")), max(col("mx"))).head()
    val userGrid =
      if (g.isNullAt(0)) // no matching users → empty grid, not an NPE
        s.range(0).select(col("id").as("user_id"),
          timestamp_millis(col("id")).as("datetime"))
      else GridOps.minuteGrid(s, g.getTimestamp(0), g.getTimestamp(1))
        .join(broadcast(bounds),
          col("datetime") >= col("mn") && col("datetime") <= col("mx"))
        .select(col("user_id"), col("datetime"))
    (candles, userGrid)
  }

  /** The multi-symbol pipeline run shared by pipeline_hybrid_by_key
    * and its (key, day)-composed backend twin: events become per-sym
    * ticks + a legacy candle feed, and the full 15-stage Pipeline runs
    * with partitionBy = Seq("sym"). */
  private def keyedPipeline(s: SparkSession, dir: String,
                            dayWindows: Boolean,
                            w1Day: Option[Boolean] = None,
                            autoWindows: Boolean = false): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val half = (lit(0.01) + (col("event_id") % 10) * lit(0.001)) / 2
    val kticks = ev.select(
      col("ts").as("datetime"), col("event_id").as("tick_id"),
      (col("value") + half).as("ask"),
      (col("value") - half).as("bid"),
      (col("user_id") % 3).as("sym"))
    val km1 = Resample.ohlc1min(
      ev.filter(col("event_type").isin("click", "view"))
        .select(col("ts").as("datetime"),
          col("event_id").as("tick_id"), col("value").as("mid"),
          lit(null).cast("double").as("spread"),
          (col("user_id") % 3).as("sym")),
      Seq("sym"))
    val out = Pipeline.run(s, kticks, Some(km1), SpikeThreshold,
      ConsensusThreshold, partitionBy = Seq("sym"),
      dayWindows = dayWindows, w1Day = w1Day,
      autoWindows = autoWindows).candles
    out.select(col("sym"), col("datetime"),
      Rounding.duckRound(col("open").cast("double"), 5).as("open"),
      Rounding.duckRound(col("high").cast("double"), 5).as("high"),
      Rounding.duckRound(col("low").cast("double"), 5).as("low"),
      Rounding.duckRound(col("close").cast("double"), 5).as("close"),
      col("volume").cast("double").as("volume"),
      Rounding.duckRound(col("spread").cast("double"), 5).as("spread"),
      col("is_flat").cast("int").as("is_flat"))
  }

  /** Gate select of the streaming composed pipeline: the replayed
    * tail emits doubles, so the float32 precision contract (P12) is
    * applied HERE with the identical cast chain pipeline_hybrid_full's
    * select evaluates on the batch output — the two gates share one
    * oracle. */
  private def pipelineStreamingSelect(df: DataFrame): DataFrame =
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

  /** The replayed TAPE of the single-symbol composed streaming
    * pipeline (candles + A1 anomaly rows): scan → prep → windowed
    * OHLC (both feeds) → consensus full-outer window join →
    * transformWithState tail, staged as a multi-batch replay with
    * cross-batch disorder, flushed by a weekday sentinel. Shared by
    * the candle gate (reason IS NULL) and the audit gate. */
  private def streamingHybridTape(s: SparkSession,
                                  dir: String): DataFrame = {
    val tCand = tickCandles(s, dir).cache()
    val mCand = m1Candles(s, dir).cache()
    val med = SpreadOps.medianSpread(FusionOps.combineFirst(
      FusionOps.rejectCatastrophes(tCand,
        FusionOps.catastrophes(tCand, mCand, ConsensusThreshold)),
      mCand))
    val ev = Tables.load(s, dir, "events")
    val m1ev = ev.filter(col("event_type").isin("click", "view"))
    val b = ev.agg(min(col("ts")), max(col("ts"))).head()
    val (mn, mx) = (b.getTimestamp(0).getTime,
      b.getTimestamp(1).getTime)
    val delayMin = (mx - mn) / 60000L + 120
    // weekday sentinel: must survive the F2 filter on the tick side
    val flush = new java.sql.Timestamp(
      streaming.StreamingPipeline.weekdaySentinelMs(
        mx + (delayMin + 1440) * 60000L))
    val flushFireMs = mx + 10 * 60000L
    def sentinel(df: DataFrame) = df.limit(1)
      .withColumn("ts", lit(flush))
      .withColumn("value", lit(1.0)) // survives the F1 filter
    val tDir = Scratch.dir("sp_ticks", dir)
    val mDir = Scratch.dir("sp_m1", dir)
    streaming.StagedReplay.stageFiles(Seq(
      ev.filter(minute(col("ts")) % 3 =!= 2),
      ev.filter(minute(col("ts")) % 3 === 2),
      sentinel(ev)), tDir)
    streaming.StagedReplay.stageFiles(Seq(
      m1ev.filter(minute(col("ts")) % 4 =!= 1),
      m1ev.filter(minute(col("ts")) % 4 === 1),
      sentinel(m1ev)), mDir)
    def stream(p: String) = s.readStream
      .schema(s.read.parquet(p).schema)
      .option("maxFilesPerTrigger", "1").parquet(p)
    val tape = streaming.StreamingPipeline.runTape(
      TickPrep(Tables.ticksFromEvents(stream(tDir))),
      stream(mDir).select(col("ts").as("datetime"),
        col("event_id").as("tick_id"), col("value").as("mid"),
        lit(null).cast("double").as("spread")),
      s"$delayMin minutes", med, SpikeThreshold, ConsensusThreshold,
      cutoffMs = flushFireMs, flushFireMs = flushFireMs)
    streaming.StreamingPipeline.replayWithRocksDb(s, tape)
  }

  /** [[pipelineStreamingSelect]] with the symbol key. */
  private def pipelineStreamingSelectKeyed(df: DataFrame): DataFrame =
    df.select(col("sym"),
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

  /** Events with a spread that is NULL on 'error' rows — input for the
    * null-handling operators (W3 ffill, U3 median fill). */
  private def eventsWithNullableSpread(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events").withColumn("spread",
      when(col("event_type") === "error", lit(null).cast("double"))
        .otherwise(lit(0.01) + (col("event_id") % 10) * lit(0.001)))

  private def roundedOhlc(candles: DataFrame, keyCols: Seq[String]): DataFrame = {
    val sel = keyCols.map(col) ++ Seq(
      col("datetime"),
      Rounding.duckRound(col("open"), 6).as("open"), Rounding.duckRound(col("high"), 6).as("high"),
      Rounding.duckRound(col("low"), 6).as("low"), Rounding.duckRound(col("close"), 6).as("close"),
      col("volume"), Rounding.duckRound(col("spread"), 6).as("spread"))
    candles.select(sel: _*)
  }

  private val SpikeThreshold = 2.0
  private val ConsensusThreshold = 50.0

  /** Where s1_csv_m1_scan materializes its CSV fixture. The path is
    * derived per (process, sfDir) so concurrent Verify/Bench runs — or
    * runs at different scale factors — never read a fixture another run
    * just overwrote, and a predictable /tmp name can't be pre-squatted.
    * The query records the path it actually wrote in [[csvFixtureDir]];
    * `oracleSql` is a def that Verify evaluates AFTER the query loop, so
    * the dumped oracle SQL names the same file. */
  private def fixtureDirFor(sfDir: String): String =
    "/tmp/graft_csv_fixture_m1_" + ProcessHandle.current().pid() + "_" +
      sfDir.replaceAll("[^A-Za-z0-9.]", "_")
  @volatile private var csvFixtureDir: String = fixtureDirFor("unset")

  /** Same per-(process, sfDir) fixture contract for the JSON-lines scan
    * (s3_json_scan). */
  private def jsonFixtureDirFor(sfDir: String): String =
    "/tmp/graft_json_fixture_events_" + ProcessHandle.current().pid() +
      "_" + sfDir.replaceAll("[^A-Za-z0-9.]", "_")
  @volatile private var jsonFixtureDir: String = jsonFixtureDirFor("unset")

  // ------------------------------------------------------------ oracle SQL
  /** The canonical tick frame (Tables.ticks) as a DuckDB CTE. */
  private val ticksCte = s"ticks AS (${Tables.ticksSql})"

  /** TickPrep (F1+F2+P6/P7) as a DuckDB CTE chained after [[ticksCte]].
    * DuckDB dayofweek is Sun=0..Sat=6 (Spark: Sun=1..Sat=7). */
  private val preppedCte =
    """prepped AS (
      |  SELECT *, (ask + bid) / 2 AS mid, ask - bid AS spread
      |  FROM ticks
      |  WHERE NOT (ask < 0.0001 OR bid < 0.0001)
      |    AND NOT (dayofweek(datetime) = 6
      |          OR (dayofweek(datetime) = 5 AND hour(datetime) >= 22)
      |          OR (dayofweek(datetime) = 0 AND hour(datetime) < 21)))""".stripMargin

  private val tickCandlesCte =
    """tick_candles AS (
      |  SELECT date_trunc('minute', datetime) AS datetime,
      |    first(mid ORDER BY datetime, tick_id) AS open,
      |    max(mid) AS high, min(mid) AS low,
      |    last(mid ORDER BY datetime, tick_id) AS close,
      |    count(mid) AS volume, avg(spread) AS spread
      |  FROM prepped GROUP BY 1)""".stripMargin

  private val m1CandlesCte =
    """m1_candles AS (
      |  SELECT date_trunc('minute', ts) AS datetime,
      |    first(value ORDER BY ts, event_id) AS open,
      |    max(value) AS high, min(value) AS low,
      |    last(value ORDER BY ts, event_id) AS close,
      |    count(*) AS volume, CAST(NULL AS DOUBLE) AS spread
      |  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1)""".stripMargin

  private val mixedCte =
    """mixed AS (
      |  SELECT * FROM (
      |    SELECT date_trunc('minute', ts) AS datetime,
      |      first(value ORDER BY ts, event_id) AS open,
      |      max(CASE WHEN event_type = 'click' THEN value END) AS high,
      |      min(CASE WHEN event_type = 'view' THEN value END) AS low,
      |      last(value ORDER BY ts, event_id) AS close,
      |      count(*) AS volume
      |    FROM events GROUP BY 1)
      |  WHERE high IS NOT NULL AND low IS NOT NULL)""".stripMargin

  private val gridCte =
    """bounds AS (
      |  SELECT min(datetime) AS mn, max(datetime) AS mx FROM tick_candles),
      |grid AS (
      |  SELECT unnest(generate_series((SELECT mn FROM bounds),
      |    (SELECT mx FROM bounds), INTERVAL 1 minute)) AS datetime)""".stripMargin

  private val fusionWith =
    s"WITH $ticksCte, $preppedCte, $tickCandlesCte, $m1CandlesCte"

  /** OHLC candle select-list over a prepped tick relation (G1–G3). */
  private def ohlcSelectSql(extraKey: String = ""): String = {
    val key = if (extraKey.isEmpty) "" else s"$extraKey, "
    s"""SELECT ${key}date_trunc('minute', datetime) AS datetime,
       |  round(first(mid ORDER BY datetime, tick_id), 6) AS open,
       |  round(max(mid), 6) AS high,
       |  round(min(mid), 6) AS low,
       |  round(last(mid ORDER BY datetime, tick_id), 6) AS close,
       |  count(mid) AS volume,
       |  round(avg(spread), 6) AS spread
       |FROM prepped
       |GROUP BY ${if (extraKey.isEmpty) "1" else "1, 2"}""".stripMargin
  }

  // ---------------------------------------------------------------- entry
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("g1_g2_g3_ohlc_resample")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * E-op extensions from [[ExtQueries]]. A `lazy val`: the 100+-entry
    * map is built once per JVM (Bench/Verify look queries up per name). */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    coreQueries ++ ExtQueries.queries

  private lazy val coreQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // S1 (+S4, P1, P3-P5): the reference's ACTUAL ingestion format, under
    // the hash gate. The query round-trips a deterministic M1-format CSV
    // (written from events via the S4 sink) through loadM1; the oracle
    // re-reads the SAME file with DuckDB read_csv, so the scan path —
    // header skip, declared float32 schema, two-string timestamp parse —
    // is what's being compared. The fixture path is per-(process, sfDir);
    // the driver runs Verify (which writes the fixture AND records the
    // path for the oracle dump) before DuckDB.
    "s1_csv_m1_scan" -> ((s, dir) => {
      csvFixtureDir = fixtureDirFor(dir)
      val src = Tables.load(s, dir, "events")
        .orderBy(col("event_id")).limit(500)
        .select(
          date_format(col("ts"), "yyyy.MM.dd").as("Date"),
          date_format(col("ts"), "HH:mm:ss").as("Time"),
          col("value").cast("float").as("Open"),
          (col("value") * 1.01).cast("float").as("High"),
          (col("value") * 0.99).cast("float").as("Low"),
          (col("value") + 0.5).cast("float").as("Close"),
          (col("event_id") % 97).cast("float").as("TickVol"))
      sources.CsvSources.writeCsv(src, csvFixtureDir)
      sources.CsvSources.loadM1(s, csvFixtureDir)
        .select(col("datetime"),
          col("open").cast("double").as("open"),
          col("high").cast("double").as("high"),
          col("low").cast("double").as("low"),
          col("close").cast("double").as("close"),
          col("volume").cast("double").as("volume"),
          col("spread").cast("double").as("spread"))
    }),

    // S2: schema'd scan + column pruning + filter pushdown
    "s2_scan_prune" -> ((s, dir) =>
      Tables.load(s, dir, "events")
        .select(col("event_id"), col("ts"), col("value"))
        .filter(col("value") >= 0.0001)),

    // S3 (ext): JSON-lines scan with a DECLARED schema (no inference
    // pass) — the third source format. Round-trips 500 events through
    // the JSON sink + scan; the oracle re-reads the SAME fixture with
    // DuckDB read_json, so the compare is between the two engines'
    // JSON scan + explicit-format timestamp parse paths.
    "s3_json_scan" -> ((s, dir) => {
      jsonFixtureDir = jsonFixtureDirFor(dir)
      sources.JsonSources.writeEvents(
        Tables.load(s, dir, "events").orderBy(col("event_id")).limit(500),
        jsonFixtureDir)
      sources.JsonSources.loadEvents(s, jsonFixtureDir)
    }),

    // P1: two-field string → timestamp parse (reference format)
    "p1_parse_timestamp" -> ((s, dir) =>
      Tables.load(s, dir, "events").select(
        col("event_id"),
        to_timestamp(
          date_format(col("ts"), "yyyy.MM.dd HH:mm:ss"),
          "yyyy.MM.dd HH:mm:ss").as("parsed"))),

    // P6+P7: mid price and spread derivation
    "p6_p7_mid_spread" -> ((s, dir) =>
      TickPrep.deriveMidSpread(Tables.ticks(s, dir)).select(
        col("tick_id"), col("datetime"),
        Rounding.duckRound(col("mid"), 6).as("mid"),
        Rounding.duckRound(col("spread"), 6).as("spread"))),

    // P13: date-part extraction (the dayofweek numbering trap).
    // Int results are widened to long: the DuckDB twin yields BIGINT, and
    // a dtype-sensitive hash compare must see identical widths.
    "p13_date_parts" -> ((s, dir) =>
      Tables.load(s, dir, "events").select(
        col("event_id"),
        dayofweek(col("ts")).cast("long").as("dow_sun1"),
        weekday(col("ts")).cast("long").as("dow_mon0"),
        hour(col("ts")).cast("long").as("hr"))),

    // F1: bad-tick (zero/garbage quote) filter
    "f1_bad_tick_filter" -> ((s, dir) =>
      TickPrep.badTickFilter(Tables.ticks(s, dir))
        .select(col("tick_id"), col("ask"), col("bid"))),

    // F2: FX weekend/market-closure filter
    "f2_weekend_filter" -> ((s, dir) =>
      TickPrep.weekendFilter(Tables.ticks(s, dir))
        .select(col("tick_id"), col("datetime"))),

    // F4: dropna on close
    "f4_dropna_close" -> ((s, dir) =>
      Tables.load(s, dir, "events")
        .select(col("event_id"),
          when(col("event_type") === "error", lit(null))
            .otherwise(col("value")).as("close"))
        .filter(col("close").isNotNull)),

    // G1+G2+G3: the flagship 1-minute OHLC+spread+tick-volume resample
    "g1_g2_g3_ohlc_resample" -> ((s, dir) =>
      roundedOhlc(tickCandles(s, dir), Nil)),

    // G1 salted variant: the skew-resistant two-phase OHLC (hot-minute
    // mitigation) — exact decomposition of every G1–G3 aggregate, so it
    // shares the plain resample's oracle
    "g1_ohlc_salted" -> ((s, dir) =>
      roundedOhlc(
        Resample.ohlc1minSalted(TickPrep(Tables.ticks(s, dir)), 16), Nil)),

    // G8: incremental candle maintenance — ticks split into a "stored"
    // batch and a "late" batch, aggregated separately to mergeable
    // partials, merged, finalized; equals the full re-aggregation (same
    // oracle as g1), proving the store absorbs late data without
    // re-reading raw history
    "g8_incremental_ohlc" -> ((s, dir) => {
      val t = TickPrep(Tables.ticks(s, dir))
      val stored = Resample.ohlcPartials(t.filter(col("tick_id") % 10 =!= 0))
      val late = Resample.ohlcPartials(t.filter(col("tick_id") % 10 === 0))
      roundedOhlc(
        Resample.finishPartials(Resample.mergePartials(stored, late)), Nil)
    }),

    // G1 streaming replay (VERDICT r3 #3): the SAME ticks pushed through
    // the Structured-Streaming resampler (readStream parquet →
    // StreamingOhlc.ohlc1min → Trigger.AvailableNow → memory sink) and
    // returned as a batch frame. Shares the batch resample's oracle, so
    // batch/stream convergence is proven at the hash level, not just in
    // StreamingOhlcSpec.
    "g1_streaming_replay" -> ((s, dir) => {
      val path = s"$dir/events.parquet"
      // raw (long-typed nanos) schema: a file stream must declare it
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.ansi.enabled", "false")
      val rawSchema = s.read.parquet(path).schema
      // the file-stream source only accepts a DIRECTORY; the testdata
      // tables are single files, so stream the parent dir with a glob
      val stream = s.readStream.schema(rawSchema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
      val ticks = Tables.ticksFromEvents(Tables.normalizeTs(stream))
      val candles = streaming.StreamingOhlc.replayToBatch(
        s, streaming.StreamingOhlc.ohlc1min(TickPrep(ticks)))
      roundedOhlc(candles, Nil)
    }),

    // G10 late-data gate (VERDICT r6 #3): the SAME ticks replayed as
    // FOUR staged micro-batches (maxFilesPerTrigger=1) through the
    // APPEND-mode streaming resampler with a 2-hour watermark — stage 3
    // carries out-of-order rows, some behind the watermark (dropped:
    // their windows were evicted at stage 2's end), some into
    // still-open windows (merged). The oracle computes the admitted
    // set from the SAME split predicates: Spark's stateful operators
    // late-filter with the PREVIOUS batch's eviction watermark (the
    // SPARK-40925 two-watermark split, pinned in
    // StreamingLateDataSpec), so a stage-3 row is dropped iff its
    // window end <= W1 = max(stage-1 event time) - 2h, and only
    // windows ending at or before the final watermark (max event time
    // - 2h) are emitted. Stage 2 exists to absorb the one-batch filter
    // lag; stage 4 advances the watermark to flush the late merges.
    "g10_streaming_late_replay" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.ansi.enabled", "false")
      val prepped = TickPrep(Tables.ticks(s, dir))
        .select(col("datetime"), col("tick_id"), col("mid"),
          col("spread"))
        .cache()
      val m = prepped.agg(max(col("datetime"))).head().getTimestamp(0)
      def cut(hoursBack: Long) =
        lit(new java.sql.Timestamp(m.getTime - hoursBack * 3600000L))
      val isStage4 = col("datetime") >= cut(1)
      val isLateDrop = col("tick_id") % 7 === 3 &&
        col("datetime") < cut(10)
      val isLateAdmit = col("tick_id") % 7 === 4 &&
        col("datetime") >= cut(3) && col("datetime") < cut(2)
      val isStage2 = col("tick_id") % 7 === 5 &&
        col("datetime") >= cut(6) && col("datetime") < cut(5)
      val tmp = Scratch.dir("late_replay", dir)
      streaming.StagedReplay.stageFiles(Seq(
        prepped.filter(!isStage4 && !isLateDrop && !isLateAdmit &&
          !isStage2),
        prepped.filter(isStage2),
        prepped.filter(isLateDrop || isLateAdmit),
        prepped.filter(isStage4)), tmp)
      val stream = s.readStream.schema(s.read.parquet(tmp).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(tmp)
      val candles = streaming.StreamingOhlc.replayToBatchAppend(
        s, streaming.StreamingOhlc.ohlc1min(stream,
          watermark = "2 hours"))
      roundedOhlc(candles, Nil)
    }),

    // J7 streaming INTERVAL join: the time-BAND stream-stream shape
    // (the fusion gates join on event-time equality; this one joins
    // an event stream to variable-length day windows via a range
    // condition — canonical band for the state bound, residual
    // predicate for the true window end). The two sides are staged
    // in OPPOSITE orders (events split by id, windows by day parity)
    // so both buffer directions of the symmetric hash join carry
    // rows; inner-join matches emit per batch, so the replay
    // converges to the batch interval join with no sentinel.
    "j7_streaming_interval_join_replay" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("ts"), col("event_id"), col("value"))
        .withColumn("dayord", expr("unix_micros(ts) div 86400000000"))
        .cache()
      val wins = ev.select(col("dayord")).distinct()
        .withColumn("wstart", expr(
          "timestamp_seconds(dayord*86400 + 7200 + (dayord % 3)*2700)"))
        .withColumn("wend", expr(
          "timestamp_seconds(dayord*86400 + 7200 + (dayord % 3)*2700" +
            " + (45 + (dayord % 4)*30)*60)"))
        .cache()
      val b = ev.agg(min(col("ts")), max(col("ts"))).head()
      // delay > full span → nothing is late in the bounded replay
      val delayMin = (b.getTimestamp(1).getTime -
        b.getTimestamp(0).getTime) / 60000L + 240
      val eDir = Scratch.dir("ivj_e", dir)
      val wDir = Scratch.dir("ivj_w", dir)
      streaming.StagedReplay.stageFiles(Seq(
        ev.filter(col("event_id") % 3 =!= 0),
        ev.filter(col("event_id") % 3 === 0)), eDir)
      streaming.StagedReplay.stageFiles(Seq(
        wins.filter(col("dayord") % 2 === 0),
        wins.filter(col("dayord") % 2 =!= 0)), wDir)
      def stream(p: String) = s.readStream
        .schema(s.read.parquet(p).schema)
        .option("maxFilesPerTrigger", "1").parquet(p)
      val joined = streaming.StreamingIntervalJoin.eventsInWindows(
        stream(eDir), stream(wDir), s"$delayMin minutes",
        "135 minutes")
      streaming.StreamingOhlc.replayWithStatePartitions(s, joined, 8)
    }),

    // J8 streaming interval join, LEFT OUTER: every event emits —
    // matched rows when both sides arrive, UNMATCHED rows only when
    // the watermark proves no window can still match, so the replay
    // needs sentinel stages on BOTH sides (the fusion-gate
    // discipline) to flush the trailing nulls. Oracle = the batch
    // left join over the same derived windows.
    "j8_streaming_interval_left_replay" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("ts"), col("event_id"), col("value"))
        .withColumn("dayord", expr("unix_micros(ts) div 86400000000"))
        .cache()
      val wins = ev.select(col("dayord")).distinct()
        .withColumn("wstart", expr(
          "timestamp_seconds(dayord*86400 + 7200 + (dayord % 3)*2700)"))
        .withColumn("wend", expr(
          "timestamp_seconds(dayord*86400 + 7200 + (dayord % 3)*2700" +
            " + (45 + (dayord % 4)*30)*60)"))
        .cache()
      val b = ev.agg(min(col("ts")), max(col("ts"))).head()
      val delayMin = (b.getTimestamp(1).getTime -
        b.getTimestamp(0).getTime) / 60000L + 240
      val flush = new java.sql.Timestamp(
        b.getTimestamp(1).getTime + (delayMin + 1440) * 60000L)
      val evSentinel = ev.limit(1)
        .withColumn("ts", lit(flush))
        .withColumn("event_id", lit(-1L))
        .withColumn("dayord", lit(-1L))
      val wSentinel = wins.limit(1)
        .withColumn("dayord", lit(-1L))
        .withColumn("wstart", lit(flush))
        .withColumn("wend", lit(flush))
      val eDir = Scratch.dir("ivjl_e", dir)
      val wDir = Scratch.dir("ivjl_w", dir)
      streaming.StagedReplay.stageFiles(Seq(
        ev.filter(col("event_id") % 3 =!= 0),
        ev.filter(col("event_id") % 3 === 0),
        evSentinel), eDir)
      streaming.StagedReplay.stageFiles(Seq(
        wins.filter(col("dayord") % 2 === 0),
        wins.filter(col("dayord") % 2 =!= 0),
        wSentinel), wDir)
      def stream(p: String) = s.readStream
        .schema(s.read.parquet(p).schema)
        .option("maxFilesPerTrigger", "1").parquet(p)
      val joined = streaming.StreamingIntervalJoin.eventsInWindowsLeft(
        stream(eDir), stream(wDir), s"$delayMin minutes",
        "135 minutes")
      streaming.StreamingOhlc.replayWithStatePartitions(s, joined, 8)
        .filter(col("ts") < lit(flush))
    }),

    // J2 streaming twin (VERDICT r13 #1): the reference's SIGNATURE
    // fusion operator as a watermarked stream-stream FULL OUTER join —
    // tick candles and the late-arriving legacy M1 feed staged as
    // separate file streams (maxFilesPerTrigger=1 pairs the stages
    // into micro-batches), joined ON the event-time minute, per-column
    // coalesce. Stage 2 of the M1 stream arrives AFTER the matching
    // tick minutes (batch 1) — the join state buffers and pairs them;
    // the sentinel stage advances the watermark past end-of-data so
    // every unmatched minute flushes its outer-null row. The delay is
    // sized past the dataset span, so the replay converges to EXACTLY
    // the batch full outer join and shares j2_combine_first's oracle.
    // Tight-watermark late-drop semantics are pinned separately in
    // StreamingFusionSpec.
    "j2_streaming_fusion_replay" -> ((s, dir) => {
      val t = tickCandles(s, dir).cache()
      val m = m1Candles(s, dir).cache()
      val b = t.select(col("datetime"))
        .unionByName(m.select(col("datetime")))
        .agg(min(col("datetime")), max(col("datetime"))).head()
      val (mn, mx) = (b.getTimestamp(0), b.getTimestamp(1))
      // delay > full span → no real row is ever late in the replay
      val delayMin = (mx.getTime - mn.getTime) / 60000L + 120
      val flush = new java.sql.Timestamp(
        mx.getTime + (delayMin + 1440) * 60000L)
      def sentinel(df: DataFrame) =
        df.limit(1).withColumn("datetime", lit(flush))
      val tDir = Scratch.dir("fusion_t", dir)
      val mDir = Scratch.dir("fusion_m", dir)
      streaming.StagedReplay.stageFiles(Seq(
        t.filter(minute(col("datetime")) % 3 =!= 2),
        t.filter(minute(col("datetime")) % 3 === 2),
        sentinel(t)), tDir)
      streaming.StagedReplay.stageFiles(Seq(
        m.filter(minute(col("datetime")) % 4 =!= 1),
        m.filter(minute(col("datetime")) % 4 === 1), // late vs batch-1 ticks
        sentinel(m)), mDir)
      def stream(p: String) = s.readStream
        .schema(s.read.parquet(p).schema)
        .option("maxFilesPerTrigger", "1").parquet(p)
      val fused = streaming.StreamingFusion.combineFirstStream(
        stream(tDir), stream(mDir), s"$delayMin minutes")
      streaming.StreamingOhlc.replayWithStatePartitions(s, fused, 8)
        .filter(col("datetime") < lit(flush))
        .select(col("datetime"),
          Rounding.duckRound(col("open"), 6).as("open"),
          Rounding.duckRound(col("high"), 6).as("high"),
          Rounding.duckRound(col("low"), 6).as("low"),
          Rounding.duckRound(col("close"), 6).as("close"),
          col("volume"),
          Rounding.duckRound(col("spread"), 6).as("spread"))
    }),

    // J2 streaming fusion BY KEY: the multi-symbol form — the
    // stream-stream full outer join keyed on (sym, datetime), the
    // composite-key shape a real multi-pair live fusion runs (state
    // partitions by symbol AND minute; Spark accepts the composite
    // equi-join because the watermarked column is among the
    // equalities). Same staging discipline as the flat gate.
    "j2_streaming_fusion_by_key_replay" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      def cand(src: DataFrame) = Resample.ohlc1min(
        src.select(col("ts").as("datetime"),
          col("event_id").as("tick_id"), col("value").as("mid"),
          lit(null).cast("double").as("spread"),
          (col("user_id") % 3).as("sym")), Seq("sym")).drop("spread")
      val t = cand(ev).cache()
      val m = cand(ev.filter(col("event_type").isin("click", "view")))
        .cache()
      val b = t.select(col("datetime"))
        .unionByName(m.select(col("datetime")))
        .agg(min(col("datetime")), max(col("datetime"))).head()
      val (mn, mx) = (b.getTimestamp(0), b.getTimestamp(1))
      val delayMin = (mx.getTime - mn.getTime) / 60000L + 120
      val flush = new java.sql.Timestamp(
        mx.getTime + (delayMin + 1440) * 60000L)
      def sentinel(df: DataFrame) =
        df.limit(1).withColumn("datetime", lit(flush))
      val tDir = Scratch.dir("fusion_kt", dir)
      val mDir = Scratch.dir("fusion_km", dir)
      streaming.StagedReplay.stageFiles(Seq(
        t.filter(minute(col("datetime")) % 3 =!= 2),
        t.filter(minute(col("datetime")) % 3 === 2),
        sentinel(t)), tDir)
      streaming.StagedReplay.stageFiles(Seq(
        m.filter(minute(col("datetime")) % 4 =!= 1),
        m.filter(minute(col("datetime")) % 4 === 1),
        sentinel(m)), mDir)
      def stream(p: String) = s.readStream
        .schema(s.read.parquet(p).schema)
        .option("maxFilesPerTrigger", "1").parquet(p)
      val fused = streaming.StreamingFusion.combineFirstStream(
        stream(tDir), stream(mDir), s"$delayMin minutes", Seq("sym"))
      streaming.StreamingOhlc.replayWithStatePartitions(s, fused, 8)
        .filter(col("datetime") < lit(flush))
        .select(col("sym"), col("datetime"),
          Rounding.duckRound(col("open"), 6).as("open"),
          Rounding.duckRound(col("high"), 6).as("high"),
          Rounding.duckRound(col("low"), 6).as("low"),
          Rounding.duckRound(col("close"), 6).as("close"),
          col("volume"))
    }),

    // J2 streaming fusion LATE-DATA gate (the g10 discipline for the
    // stream-stream join): tick candles arrive complete in batch 1;
    // the M1 feed splits into an on-time stage and a LATE stage two
    // batches later. With a 7230-second delay (30s off the minute
    // grid, so the eviction boundary never coincides with a row), the
    // join's one-batch-lagged late filter drops exactly the late M1
    // rows behind W1 = min(side maxima) − delay — visible as
    // vanished m1-only minutes. The oracle applies the SAME predicate
    // to the M1 side of the batch full outer join.
    "j2_fusion_late_replay" -> ((s, dir) => {
      val t = tickCandles(s, dir).cache()
      val m = m1Candles(s, dir).cache()
      val isLate = minute(col("datetime")) % 4 === 1
      val mOn = m.filter(!isLate)
      val mLate = m.filter(isLate)
      val maxAll = t.select(col("datetime"))
        .unionByName(m.select(col("datetime")))
        .agg(max(col("datetime"))).head().getTimestamp(0)
      val flush = new java.sql.Timestamp(
        maxAll.getTime + 2L * 86400000L)
      def sentinel(df: DataFrame) =
        df.limit(1).withColumn("datetime", lit(flush))
      val tDir = Scratch.dir("fusion_late_t", dir)
      val mDir = Scratch.dir("fusion_late_m", dir)
      streaming.StagedReplay.stageFiles(Seq(
        t, t.limit(0), t.limit(0), sentinel(t)), tDir)
      streaming.StagedReplay.stageFiles(Seq(
        mOn, m.limit(0), mLate, sentinel(m)), mDir)
      def stream(p: String) = s.readStream
        .schema(s.read.parquet(p).schema)
        .option("maxFilesPerTrigger", "1").parquet(p)
      val fused = streaming.StreamingFusion.combineFirstStream(
        stream(tDir), stream(mDir), "7230 seconds")
      streaming.StreamingOhlc.replayWithStatePartitions(s, fused, 8)
        .filter(col("datetime") < lit(flush))
        .select(col("datetime"),
          Rounding.duckRound(col("open"), 6).as("open"),
          Rounding.duckRound(col("high"), 6).as("high"),
          Rounding.duckRound(col("low"), 6).as("low"),
          Rounding.duckRound(col("close"), 6).as("close"),
          col("volume"),
          Rounding.duckRound(col("spread"), 6).as("spread"))
    }),

    // S8: ORC round-trip — the tick candles written through the
    // day-partitioned ORC store (Spark's second built-in columnar
    // format) and read back; sharing the batch resample's oracle
    // proves the round-trip lossless at the value level (DuckDB reads
    // no ORC, so the gate is the strongest cross-format check
    // available: storage format changed, answer hash didn't).
    "s8_orc_roundtrip_ohlc" -> ((s, dir) => {
      val tmp = Scratch.dir("orc_store", dir)
      sources.ParquetSinks.writeDayPartitionedOrc(
        tickCandles(s, dir), tmp)
      roundedOhlc(
        sources.ParquetSinks.readDayPartitionedOrc(s, tmp)
          .drop("date"), Nil)
    }),

    // G1 keyed variant: per-user (symbol-style) OHLC — the scale shape
    "g1_ohlc_by_key" -> ((s, dir) => {
      val ticks = Tables.load(s, dir, "events").select(
        col("ts").as("datetime"), col("event_id").as("tick_id"),
        col("user_id"), col("value").as("mid"),
        lit(null).cast("double").as("spread"))
      roundedOhlc(Resample.ohlc1min(ticks, Seq("user_id")), Seq("user_id"))
        .drop("spread")
    }),

    // G5: exact median as grouped aggregate
    "g5_median_spread" -> ((s, dir) =>
      TickPrep.deriveMidSpread(Tables.ticks(s, dir))
        .groupBy()
        .agg(Rounding.duckRound(percentile(col("spread"), lit(0.5)), 6)
          .as("median_spread"))),

    // G6: count-style reductions
    "g6_count_reductions" -> ((s, dir) =>
      Tables.load(s, dir, "events").agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("user_id")).as("n_users"),
        count(when(col("value") < 1.0, 1)).as("n_small"))),

    // O2: deterministic top-k (TakeOrderedAndProject)
    "o2_top5_offenders" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
          col("l_linenumber"))
        .limit(5)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"))),

    // J1: reindex-align — left join of tick candles against the M1 feed
    "j1_reindex_left_join" -> ((s, dir) => {
      val t = tickCandles(s, dir)
        .select(col("datetime"), col("close").as("tick_close"))
      val m = m1Candles(s, dir)
        .select(col("datetime"), col("close").as("m1_close"))
      FusionOps.reindexAlign(t, m).select(col("datetime"),
        Rounding.duckRound(col("tick_close"), 6).as("tick_close"),
        Rounding.duckRound(col("m1_close"), 6).as("m1_close"))
    }),

    // J2: combine_first — full outer + per-column coalesce (hybrid fusion)
    "j2_combine_first" -> ((s, dir) => {
      val fused = FusionOps.combineFirst(tickCandles(s, dir),
        m1Candles(s, dir))
      fused.select(col("datetime"),
        Rounding.duckRound(col("open"), 6).as("open"), Rounding.duckRound(col("high"), 6).as("high"),
        Rounding.duckRound(col("low"), 6).as("low"), Rounding.duckRound(col("close"), 6).as("close"),
        col("volume"), Rounding.duckRound(col("spread"), 6).as("spread"))
    }),

    // J3 (+P9): index intersection — the validator's forensic inner join
    "j3_index_intersection" -> ((s, dir) => {
      val t = tickCandles(s, dir)
        .select(col("datetime"), col("close").as("tick_close"))
      val m = m1Candles(s, dir)
        .select(col("datetime"), col("close").as("m1_close"))
      FusionOps.intersectAlign(t, m)
        .withColumn("close_diff", abs(col("tick_close") - col("m1_close")))
        .select(col("datetime"),
          Rounding.duckRound(col("tick_close"), 6).as("tick_close"),
          Rounding.duckRound(col("m1_close"), 6).as("m1_close"),
          Rounding.duckRound(col("close_diff"), 6).as("close_diff"))
    }),

    // F7+F8: consensus catastrophe detection + anti-join rejection
    "f7_f8_consensus_reject" -> ((s, dir) => {
      val t = tickCandles(s, dir)
      val cata = FusionOps.catastrophes(t, m1Candles(s, dir),
        ConsensusThreshold)
      FusionOps.rejectCatastrophes(t, cata)
        .select(col("datetime"), Rounding.duckRound(col("close"), 6).as("close"))
    }),

    // F5: inverted-candle drop (low > high)
    "f5_drop_inverted" -> ((s, dir) =>
      CleanOps.dropInverted(mixedCandles(s, dir)).select(col("datetime"),
        Rounding.duckRound(col("open"), 6).as("open"), Rounding.duckRound(col("high"), 6).as("high"),
        Rounding.duckRound(col("low"), 6).as("low"), Rounding.duckRound(col("close"), 6).as("close"),
        col("volume"))),

    // U1: structural-integrity repair (widen candle to contain open/close)
    "u1_structural_repair" -> ((s, dir) =>
      CleanOps.structuralRepair(
        CleanOps.dropInverted(mixedCandles(s, dir))
          .withColumn("spread", lit(null).cast("double")))
        .select(col("datetime"),
          Rounding.duckRound(col("open"), 6).as("open"),
          Rounding.duckRound(col("high"), 6).as("high"),
          Rounding.duckRound(col("low"), 6).as("low"),
          Rounding.duckRound(col("close"), 6).as("close"),
          col("volume"))),

    // F6 (+P8+P10): volatility-spike filter with lag over survivors
    "f6_spike_filter" -> ((s, dir) =>
      CleanOps.spikeFilter(tickCandles(s, dir), SpikeThreshold)
        .select(col("datetime"),
          Rounding.duckRound(col("open"), 6).as("open"),
          Rounding.duckRound(col("high"), 6).as("high"),
          Rounding.duckRound(col("low"), 6).as("low"),
          Rounding.duckRound(col("close"), 6).as("close"),
          col("volume"))),

    // P14: semi-structured props extraction (events.props is a JSON
    // string) — JSON path on the Spark side, json_extract in the oracle
    "p14_json_props_extract" -> ((s, dir) =>
      Tables.load(s, dir, "events").select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))),

    // W6: gap-based sessionization — 30-minute inactivity starts a new
    // session; microsecond-epoch arithmetic is exact in both engines
    "w6_sessionize" -> ((s, dir) => {
      val w = WindowOps.timeWindow(Seq("user_id"), Seq("ts", "event_id"))
      val tus = unix_micros(col("ts"))
      val lagTus = WindowOps.lag1(tus, Seq("user_id"), Seq("ts", "event_id"))
      val newSession = when(
        lagTus.isNull || tus - lagTus > 1800L * 1000000L, 1L).otherwise(0L)
      Tables.load(s, dir, "events").select(
        col("user_id"), col("event_id"),
        sum(newSession).over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow))
          .as("session_id"))
    }),

    // W6 streaming replay: sessionization via Spark's native
    // session_window — per user, events merge into a session while the
    // gap to the previous event is at most 30 min; only a gap STRICTLY
    // over 30 min splits (touching session windows merge —
    // spec-pinned in StreamingSessionizeSpec), which is exactly the
    // batch w6 ordinal's `> 1800 s` split rule. Replayed complete-mode
    // to a batch frame and hash-compared against a per-session
    // aggregate oracle: the streaming session store must converge to
    // the batch lag-window session split.
    "w6_streaming_sessions_replay" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.ansi.enabled", "false")
      val rawSchema = s.read.parquet(s"$dir/events.parquet").schema
      val stream = s.readStream.schema(rawSchema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
      graft.streaming.StreamingOhlc.replayToBatch(s,
        graft.streaming.StreamingSessionize.sessions(
          Tables.normalizeTs(stream)))
    }),

    // G7: bucketed histogram — portable floor-division bucketing
    "g7_value_histogram" -> ((s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(floor(col("value") / 50.0).as("bucket"))
        .agg(count(lit(1)).as("n"),
          Rounding.duckRound(avg(col("value")), 6).as("avg_value"))),

    // U0+A1: audit-log union of anomaly complements with reason literals
    "u0_union_audit" -> ((s, dir) => {
      val t = tickCandles(s, dir)
      val audit = AuditOps.union(Seq(
        AuditOps.tag(CleanOps.invertedRows(mixedCandles(s, dir)),
          AuditOps.ReasonDroppedInverted),
        AuditOps.tag(CleanOps.spikeRows(t, SpikeThreshold),
          AuditOps.ReasonDroppedSpike),
        AuditOps.tag(
          FusionOps.catastrophes(t, m1Candles(s, dir), ConsensusThreshold)
            .withColumnRenamed("tick_close", "close"),
          AuditOps.ReasonRejectedCatastrophe)))
      audit.select(col("datetime"),
        Rounding.duckRound(col("open"), 6).as("open"), Rounding.duckRound(col("high"), 6).as("high"),
        Rounding.duckRound(col("low"), 6).as("low"), Rounding.duckRound(col("close"), 6).as("close"),
        col("volume"), col("reason"))
    }),

    // W2 (+P10): lag / pct_change, partitioned by key for scale.
    // Zero/absent lag → NULL explicitly on both sides: engines disagree
    // on float x/0 (NULL vs IEEE inf depending on version/settings).
    "w2_lag_pct_change" -> ((s, dir) => {
      val lagV = WindowOps.lag1(col("value"), Seq("user_id"),
        Seq("ts", "event_id"))
      Tables.load(s, dir, "events").select(
        col("user_id"), col("event_id"),
        when(lagV.isNull || lagV === 0, lit(null))
          .otherwise(Rounding.duckRound(abs(col("value") / lagV - 1), 6)).as("pct"))
    }),

    // W3: forward-fill over nulls, partitioned by key
    "w3_ffill_spread" -> ((s, dir) =>
      eventsWithNullableSpread(s, dir).select(
        col("user_id"), col("event_id"),
        Rounding.duckRound(WindowOps.ffill(col("spread"), Seq("user_id"),
          Seq("ts", "event_id")), 6).as("spread"))),

    // W1: centered rolling median (window 5, min_periods 1)
    "w1_rolling_median" -> ((s, dir) =>
      Tables.load(s, dir, "events").select(
        col("user_id"), col("event_id"),
        Rounding.duckRound(WindowOps.rollingMedian5(col("value"), Seq("user_id"),
          Seq("ts", "event_id")), 6).as("med5"))),

    // W7: trailing rolling mean (window 5, min_periods 1) — the
    // smoothing sibling of W1, same partition-parallel window shape
    "w7_rolling_mean" -> ((s, dir) =>
      Tables.load(s, dir, "events").select(
        col("user_id"), col("event_id"),
        Rounding.duckRound(WindowOps.rollingMean5(col("value"),
          Seq("user_id"), Seq("ts", "event_id")), 6).as("mean5"))),

    // U3 (+G5): scalar fillna with the global median (two-job shape)
    "u3_median_fill_spread" -> ((s, dir) => {
      val ev = eventsWithNullableSpread(s, dir)
      SpreadOps.fillSpread(ev, SpreadOps.medianSpread(ev))
        .select(col("event_id"), Rounding.duckRound(col("spread"), 6).as("spread"))
    }),

    // J5 (engine extension — SURVEY §2.4 notes the reference has no
    // as-of join): most recent per-user checkpoint at or before each
    // event. Checkpoints exist only for minutes divisible by 5, so most
    // events reach back across minutes; events before their user's first
    // checkpoint exercise the left-join NULL path; an event exactly on a
    // checkpoint minute start exercises the inclusive (>=) bound.
    "j5_asof_join" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val cp = ev
        .groupBy(col("user_id"),
          date_trunc("minute", col("ts")).as("cp_ts"))
        .agg(max(col("value")).as("cp_value"))
        .filter(minute(col("cp_ts")) % 5 === 0)
      ops.AsofJoin.asof(
        ev.select(col("event_id"), col("ts"), col("user_id"),
          col("value")),
        cp, keys = Seq("user_id"), leftTime = "ts", rightTime = "cp_ts",
        rightVals = Seq("cp_value"))
    }),

    // J5 tolerance variant: a prior checkpoint further than 2 minutes
    // back is no match (pandas merge_asof tolerance semantics) — the
    // bound is an exact integer-microsecond projection after the same
    // union–sort–fill join
    "j5_asof_tolerance" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val cp = ev
        .groupBy(col("user_id"),
          date_trunc("minute", col("ts")).as("cp_ts"))
        .agg(max(col("value")).as("cp_value"))
        .filter(minute(col("cp_ts")) % 5 === 0)
      ops.AsofJoin.asofTolerance(
        ev.select(col("event_id"), col("ts"), col("user_id"),
          col("value")),
        cp, keys = Seq("user_id"), leftTime = "ts", rightTime = "cp_ts",
        rightVals = Seq("cp_value"), toleranceSec = 120L)
    }),

    // J6 (engine extension): interval-containment join — classify each
    // event's value into an irregular band via a broadcast range join
    // (BroadcastNestedLoopJoin over a catalog-sized interval dimension;
    // see ops/RangeJoin for the bin-and-equi-join scale path)
    "j6_range_join" -> ((s, dir) => {
      import s.implicits._
      val bands = Seq(
        (0L, 0.0, 1.0), (1L, 1.0, 5.0), (2L, 5.0, 20.0),
        (3L, 20.0, 75.0), (4L, 75.0, 200.0), (5L, 200.0, 1000.0))
        .toDF("band_id", "lo", "hi")
      ops.RangeJoin.bandJoin(
        Tables.load(s, dir, "events").select(col("event_id"), col("value")),
        bands, "value")
    }),

    // O3: per-key top-k (deterministic value-desc, id-asc tie-break) —
    // the grouped complement of O2's global top-5
    "o3_topk_per_user" -> ((s, dir) =>
      Tables.load(s, dir, "events")
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("value").desc, col("event_id"))))
        .filter(col("rnk") <= 3)
        .select(col("user_id"), col("rnk").cast("long").as("rnk"),
          col("event_id"), col("value"))),

    // T1: dense 1-minute calendar (distributed range, not sequence())
    "t1_minute_grid" -> ((s, dir) =>
      gridOf(s, tickCandles(s, dir))),

    // J4: grid reindex — align candles onto the dense calendar
    "j4_grid_reindex" -> ((s, dir) => {
      val t = tickCandles(s, dir)
      gridOf(s, t).join(t.select(col("datetime"), col("close")),
        Seq("datetime"), "left")
        .select(col("datetime"), Rounding.duckRound(col("close"), 6).as("close"))
    }),

    // U2 (+W4+W5+P11+F4): flat-candle gap bridging on the immutable grid
    "u2_flat_candle_bridge" -> ((s, dir) => {
      val t = tickCandles(s, dir)
      GridOps.flatCandleBridge(t, gridOf(s, t))
        .select(col("datetime"),
          Rounding.duckRound(col("open"), 6).as("open"),
          Rounding.duckRound(col("high"), 6).as("high"),
          Rounding.duckRound(col("low"), 6).as("low"),
          Rounding.duckRound(col("close"), 6).as("close"),
          col("volume"), Rounding.duckRound(col("spread"), 6).as("spread"),
          col("is_flat"))
    }),

    // U2 keyed variant: per-symbol grids + partition-parallel ffill —
    // the multi-key generalization (SURVEY §2.12) that removes the
    // single-partition window constraint at scale. Per-user bounds
    // range-join against one global distributed grid (broadcast bounds).
    "u2_bridge_by_key" -> ((s, dir) => {
      val (candles, userGrid) = keyedCandlesAndGrid(s, dir)
      GridOps.flatCandleBridge(candles, userGrid, Seq("user_id"))
        .select(col("user_id"), col("datetime"),
          Rounding.duckRound(col("close"), 6).as("close"), col("is_flat"))
    }),

    // U2 keyed variant over the (key, day)-composed backend: the same
    // per-symbol bridge with the ffill running (user, day)-parallel
    // (DayWindows keyed composition) — the scale shape for SKEWED key
    // distributions, where one dominant key would serialize its whole
    // span into a single task under the plain keyed window. Shares
    // u2_bridge_by_key's oracle: backend changed, answer hash didn't.
    "u2_bridge_by_key_day_part" -> ((s, dir) => {
      val (candles, userGrid) = keyedCandlesAndGrid(s, dir)
      GridOps.flatCandleBridgeByDay(candles, userGrid, Seq("user_id"))
        .select(col("user_id"), col("datetime"),
          Rounding.duckRound(col("close"), 6).as("close"), col("is_flat"))
    }),

    // U2 day-partitioned backend: identical semantics to
    // u2_flat_candle_bridge with NO single-partition window — the
    // SCALE.md escape hatch for single-key frames, proven at the oracle
    "u2_bridge_day_part" -> ((s, dir) => {
      val t = tickCandles(s, dir)
      GridOps.flatCandleBridgeByDay(t, gridOf(s, t))
        .select(col("datetime"),
          Rounding.duckRound(col("open"), 6).as("open"),
          Rounding.duckRound(col("high"), 6).as("high"),
          Rounding.duckRound(col("low"), 6).as("low"),
          Rounding.duckRound(col("close"), 6).as("close"),
          col("volume"), Rounding.duckRound(col("spread"), 6).as("spread"),
          col("is_flat"))
    }),

    // U2 streaming replay (VERDICT r5 #4): the tick candles pushed
    // through the Structured-Streaming gap bridge (batch candles → temp
    // parquet → readStream → StreamingGapBridge → Trigger.AvailableNow →
    // memory sink) and hash-compared against the BATCH bridge oracle —
    // stream-to-batch convergence for the stateful flat-candle operator,
    // the same gate g1_streaming_replay provides for the resampler. The
    // candle frame is written as ONE file so the replay is one
    // micro-batch in minute order (the bridge drops candles behind its
    // bridged frontier — the immutable-grid contract — so a multi-batch
    // replay would need time-ordered file arrival). The resampler itself
    // is gated separately by g1_streaming_replay; this isolates the
    // bridge.
    "u2_streaming_bridge_replay" -> ((s, dir) => {
      import s.implicits._
      val tmp = Scratch.dir("bridge_replay", dir)
      tickCandles(s, dir).coalesce(1).write.mode("overwrite").parquet(tmp)
      val stream = s.readStream.schema(s.read.parquet(tmp).schema)
        .parquet(tmp)
      val ins = stream.select(lit("all").as("key"), col("datetime"),
          col("open").cast("double").as("open"),
          col("high").cast("double").as("high"),
          col("low").cast("double").as("low"),
          col("close").cast("double").as("close"),
          col("volume").cast("long").as("volume"),
          col("spread").cast("double").as("spread"))
        .as[graft.streaming.StreamingGapBridge.CandleIn]
      val bridged = graft.streaming.StreamingGapBridge.bridge(ins)
      graft.streaming.StreamingOhlc.replayToBatchAppend(s, bridged.toDF())
        .select(col("datetime"),
          Rounding.duckRound(col("open"), 6).as("open"),
          Rounding.duckRound(col("high"), 6).as("high"),
          Rounding.duckRound(col("low"), 6).as("low"),
          Rounding.duckRound(col("close"), 6).as("close"),
          col("volume"), Rounding.duckRound(col("spread"), 6).as("spread"),
          col("is_flat"))
    }),

    // F6 day-partitioned backend: identical semantics to f6_spike_filter,
    // lag carried across day boundaries by a broadcast patch table
    "f6_spike_day_part" -> ((s, dir) =>
      CleanOps.spikeFilterByDay(tickCandles(s, dir), SpikeThreshold)
        .select(col("datetime"),
          Rounding.duckRound(col("open"), 6).as("open"),
          Rounding.duckRound(col("high"), 6).as("high"),
          Rounding.duckRound(col("low"), 6).as("low"),
          Rounding.duckRound(col("close"), 6).as("close"),
          col("volume"))),

    // Full composed pipeline (§3): the reference's run() end-to-end,
    // including P12's float32 cast (values re-widened for comparison).
    //
    // Cache contract: Pipeline.run pins candle caches and returns a
    // release() these lazy adapters cannot invoke (the caller controls
    // materialization). Verify and Bench clearCache() after every query —
    // that is their documented contract; a long-lived LIBRARY session
    // should call Pipeline.run directly and invoke Result.release after
    // its last action (same for the Dedup near-dup caches, released via
    // clearCache or session teardown).
    "pipeline_hybrid_full" -> ((s, dir) => {
      val out = Pipeline.run(s, Tables.ticks(s, dir),
        Some(m1Candles(s, dir)), SpikeThreshold, ConsensusThreshold).candles
      out.select(col("datetime"),
        Rounding.duckRound(col("open").cast("double"), 5).as("open"),
        Rounding.duckRound(col("high").cast("double"), 5).as("high"),
        Rounding.duckRound(col("low").cast("double"), 5).as("low"),
        Rounding.duckRound(col("close").cast("double"), 5).as("close"),
        col("volume").cast("double").as("volume"),
        Rounding.duckRound(col("spread").cast("double"), 5).as("spread"),
        col("is_flat").cast("int").as("is_flat"))
    }),

    // A1/S5 over the composed pipeline: the full audit log (all five
    // anomaly classes) as one query
    "pipeline_audit" -> ((s, dir) => {
      val audit = Pipeline.run(s, Tables.ticks(s, dir),
        Some(m1Candles(s, dir)), SpikeThreshold, ConsensusThreshold).audit
      audit.select(col("datetime"),
        Rounding.duckRound(col("open"), 5).as("open"), Rounding.duckRound(col("high"), 5).as("high"),
        Rounding.duckRound(col("low"), 5).as("low"), Rounding.duckRound(col("close"), 5).as("close"),
        Rounding.duckRound(col("volume"), 5).as("volume"), col("reason"))
    }),

    // The composed pipeline on the day-partitioned window backends
    // (VERDICT r3 #1): identical semantics — it shares
    // pipeline_hybrid_full's oracle — but every full-frame window stage
    // (W1 smoothing, U1's W3 ffill, F6's lag, the W4/W5 bridge) runs
    // day-parallel via DayWindows; the only unpartitioned windows left
    // operate on O(days) patch/edge tables. This is the plan shape a
    // single-symbol 100 TB run would execute.
    "pipeline_hybrid_day_part" -> ((s, dir) => {
      val out = Pipeline.run(s, Tables.ticks(s, dir),
        Some(m1Candles(s, dir)), SpikeThreshold, ConsensusThreshold,
        dayWindows = true).candles
      out.select(col("datetime"),
        Rounding.duckRound(col("open").cast("double"), 5).as("open"),
        Rounding.duckRound(col("high").cast("double"), 5).as("high"),
        Rounding.duckRound(col("low").cast("double"), 5).as("low"),
        Rounding.duckRound(col("close").cast("double"), 5).as("close"),
        col("volume").cast("double").as("volume"),
        Rounding.duckRound(col("spread").cast("double"), 5).as("spread"),
        col("is_flat").cast("int").as("is_flat"))
    }),

    // The MIXED-backend composed pipeline (VERDICT r15 #1): the r15
    // ScaleProbe measured that at 100× span the day backend wins ONLY
    // for W1's rolling median (superlinear per-row work) and loses for
    // the trivial ffill/lag windows (the patch-table exchanges cost
    // more than the single-task serialization they remove). This is
    // the measured-best large-span single-key shape: W1 through
    // DayWindows, everything else global. Identical semantics — shares
    // pipeline_hybrid_full's oracle.
    "pipeline_hybrid_mixed_part" -> ((s, dir) => {
      val out = Pipeline.run(s, Tables.ticks(s, dir),
        Some(m1Candles(s, dir)), SpikeThreshold, ConsensusThreshold,
        w1Day = Some(true)).candles
      out.select(col("datetime"),
        Rounding.duckRound(col("open").cast("double"), 5).as("open"),
        Rounding.duckRound(col("high").cast("double"), 5).as("high"),
        Rounding.duckRound(col("low").cast("double"), 5).as("low"),
        Rounding.duckRound(col("close").cast("double"), 5).as("close"),
        col("volume").cast("double").as("volume"),
        Rounding.duckRound(col("spread").cast("double"), 5).as("spread"),
        col("is_flat").cast("int").as("is_flat"))
    }),

    // AUTO backend selection (r16): the measured three-regime rule
    // (SCALE.md §r16 — global < 1 M candle rows, mixed 1-10 M,
    // all-day > 10 M) applied from the candle count run materializes
    // anyway. At gate scale the dispatch picks the global regime, so
    // this shares pipeline_hybrid_full's oracle; PipelineSpec pins
    // the thresholds and that auto equals the explicit modes.
    "pipeline_hybrid_auto_part" -> ((s, dir) => {
      val out = Pipeline.run(s, Tables.ticks(s, dir),
        Some(m1Candles(s, dir)), SpikeThreshold, ConsensusThreshold,
        autoWindows = true).candles
      out.select(col("datetime"),
        Rounding.duckRound(col("open").cast("double"), 5).as("open"),
        Rounding.duckRound(col("high").cast("double"), 5).as("high"),
        Rounding.duckRound(col("low").cast("double"), 5).as("low"),
        Rounding.duckRound(col("close").cast("double"), 5).as("close"),
        col("volume").cast("double").as("volume"),
        Rounding.duckRound(col("spread").cast("double"), 5).as("spread"),
        col("is_flat").cast("int").as("is_flat"))
    }),

    // The audit log on the day-partitioned backends — exercises the
    // spikeRowsByDay complement and the gap-bridged class through the
    // day-parallel plan; shares pipeline_audit's oracle.
    "pipeline_audit_day_part" -> ((s, dir) => {
      val audit = Pipeline.run(s, Tables.ticks(s, dir),
        Some(m1Candles(s, dir)), SpikeThreshold, ConsensusThreshold,
        dayWindows = true).audit
      audit.select(col("datetime"),
        Rounding.duckRound(col("open"), 5).as("open"), Rounding.duckRound(col("high"), 5).as("high"),
        Rounding.duckRound(col("low"), 5).as("low"), Rounding.duckRound(col("close"), 5).as("close"),
        Rounding.duckRound(col("volume"), 5).as("volume"), col("reason"))
    }),

    // The composed pipeline PER SYMBOL (VERDICT r6 #5): the signature
    // code path Pipeline.run(partitionBy = Seq("sym")) under the hash
    // gate, not just the unit suite. sym = user_id % 3 is planted on
    // both feeds; every window/join/groupBy keys by it, while the G5
    // median fill and the minute grid stay GLOBAL by design (the grid
    // is cross-joined with the symbol set) — the oracle mirrors
    // exactly that split.
    "pipeline_hybrid_by_key" -> ((s, dir) =>
      keyedPipeline(s, dir, dayWindows = false)),

    // The keyed pipeline over the (key, day)-composed window backends
    // (r8): every window stage runs (sym, day)-parallel — the shape
    // for skewed symbol distributions where one dominant pair would
    // serialize its span under the plain keyed windows. Shares
    // pipeline_hybrid_by_key's oracle: backend changed, hash didn't.
    "pipeline_hybrid_by_key_day_part" -> ((s, dir) =>
      keyedPipeline(s, dir, dayWindows = true)),

    // The keyed pipeline on the MIXED backend (r16): W1 runs
    // (sym, day)-parallel, ffill/lag/bridge stay plain-keyed — the
    // measured-best shape composed with partitionBy. Shares
    // pipeline_hybrid_by_key's oracle: backend changed, hash didn't.
    "pipeline_hybrid_by_key_mixed_part" -> ((s, dir) =>
      keyedPipeline(s, dir, dayWindows = false, w1Day = Some(true))),

    // KEYED auto backend selection (VERDICT r16 #1): the three-regime
    // rule dispatched on the DOMINANT key's candle count
    // (Pipeline.dispatchRows — a keyed window's straggler is
    // max-per-key, not the total), from one tiny per-key aggregate on
    // the frame run caches anyway. At gate scale every key sits in the
    // global regime, so this shares pipeline_hybrid_by_key's oracle;
    // PipelineSpec pins that the dispatch follows the max (one
    // dominant + many small keys) and not the sum.
    "pipeline_hybrid_by_key_auto_part" -> ((s, dir) =>
      keyedPipeline(s, dir, dayWindows = false, autoWindows = true)),

    // The reference's FULL run() as ONE continuous streaming query
    // (VERDICT r14 #2): scan → prep → windowed OHLC (both feeds) →
    // consensus full-outer window join → transformWithState tail
    // (spread recovery, validation, grid bridge) — four chained
    // stateful operators, no foreachBatch, no intermediate sink.
    // Staged multi-batch replay with cross-batch disorder on both
    // sides; the watermark delay exceeds the span, a sentinel stage
    // flushes the join, and the tail's end-of-replay timer drains the
    // W1 lookahead — so the replay converges to EXACTLY the batch
    // pipeline and shares pipeline_hybrid_full's oracle. G5's median
    // is the documented two-pass parameter: computed batch-exact
    // first (the reference's own first pass), passed as config.
    "pipeline_hybrid_streaming_replay" -> ((s, dir) =>
      pipelineStreamingSelect(streamingHybridTape(s, dir)
        .filter(col("reason").isNull))),

    // A1 over the composed STREAMING pipeline: the tail emits every
    // anomaly class onto the same tape as the candles (catastrophe
    // rejections pass the rejected tick close through the join's
    // CASE; F5/U1/F6 record their stage's values; flats come off the
    // candle lane) — one continuous query produces BOTH of run()'s
    // outputs, closing the audit asymmetry. Shares pipeline_audit's
    // oracle.
    "pipeline_audit_streaming_replay" -> ((s, dir) => {
      val tape = streamingHybridTape(s, dir).cache()
      val anomalies = tape.filter(col("reason").isNotNull)
        .select(col("datetime"),
          Rounding.duckRound(col("open"), 5).as("open"),
          Rounding.duckRound(col("high"), 5).as("high"),
          Rounding.duckRound(col("low"), 5).as("low"),
          Rounding.duckRound(col("close"), 5).as("close"),
          Rounding.duckRound(col("volume").cast("double"), 5)
            .as("volume"),
          col("reason"))
      // the flat class reads the float32-cast candle output, exactly
      // like the batch audit (it tags result rows post-finalCast)
      val fclose =
        Rounding.duckRound(col("close").cast("float").cast("double"), 5)
      val flats = tape
        .filter(col("reason").isNull && col("is_flat") === 1)
        .select(col("datetime"), fclose.as("open"), fclose.as("high"),
          fclose.as("low"), fclose.as("close"),
          lit(0.0).as("volume"),
          lit(AuditOps.ReasonGapBridged).as("reason"))
      anomalies.unionByName(flats)
    }),

    // The composed streaming pipeline under the g10 LATE-DATA
    // discipline: the tick feed's stage-3 rows arrive two batches
    // late with a tight 7230 s watermark — rows whose minute window
    // closed at or before W1 (max on-time prepped event time − 7230 s)
    // are dropped at the OHLC aggregation; survivors merge into their
    // still-open windows and flow through the join and tail. The M1
    // feed arrives complete in batch 1 (never late). The oracle runs
    // the whole batch pipeline over exactly the admitted tick set.
    "pipeline_hybrid_streaming_late_replay" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val m1ev = ev.filter(col("event_type").isin("click", "view"))
      // staging bands are defined over PREPPED event times (the
      // watermark node sits after the prep filters)
      val mxP = TickPrep(Tables.ticks(s, dir))
        .agg(max(col("datetime"))).head().getTimestamp(0)
      def cutH(h: Long) =
        lit(new java.sql.Timestamp(mxP.getTime - h * 3600000L))
      val isLateDrop = col("event_id") % 7 === 3 &&
        col("ts") < cutH(10)
      val isLateAdmit = col("event_id") % 7 === 4 &&
        col("ts") >= cutH(3) && col("ts") < cutH(2)
      val isStage2 = col("event_id") % 7 === 5 &&
        col("ts") >= cutH(6) && col("ts") < cutH(5)
      val delaySec = 7230L
      val flush = new java.sql.Timestamp(
        streaming.StreamingPipeline.weekdaySentinelMs(
          mxP.getTime + delaySec * 1000L + 1440 * 60000L))
      val flushFireMs = mxP.getTime + 10 * 60000L
      def sentinel(df: DataFrame) = df.limit(1)
        .withColumn("ts", lit(flush))
        .withColumn("value", lit(1.0))
      val tDir = Scratch.dir("spl_ticks", dir)
      val mDir = Scratch.dir("spl_m1", dir)
      streaming.StagedReplay.stageFiles(Seq(
        ev.filter(!isLateDrop && !isLateAdmit && !isStage2),
        ev.filter(isStage2),
        ev.filter(isLateDrop || isLateAdmit),
        sentinel(ev)), tDir)
      streaming.StagedReplay.stageFiles(Seq(
        m1ev, sentinel(m1ev)), mDir)
      // two-pass median over the fused frame the ADMITTED ticks build
      // (mirrors the oracle's own median CTE). W1 is the GLOBAL
      // watermark batch 3's filter sees: min over both sources' maxima
      // through batch 1 (the one-batch filter lag), minus the delay.
      val mxM1 = m1ev.agg(max(col("ts"))).head()
        .getTimestamp(0).getTime
      val w1Ms = math.min(mxP.getTime, mxM1) - delaySec * 1000L
      val admitted = Tables.ticks(s, dir).filter(
        !(col("tick_id") % 7 === 3 && col("datetime") < cutH(10) ||
          col("tick_id") % 7 === 4 && col("datetime") >= cutH(3) &&
            col("datetime") < cutH(2)) ||
        date_trunc("minute", col("datetime")) +
          expr("INTERVAL 1 MINUTE") >
          lit(new java.sql.Timestamp(w1Ms)))
      val tCand = Resample.ohlc1min(TickPrep(admitted)).cache()
      val mCand = m1Candles(s, dir).cache()
      val med = SpreadOps.medianSpread(FusionOps.combineFirst(
        FusionOps.rejectCatastrophes(tCand,
          FusionOps.catastrophes(tCand, mCand, ConsensusThreshold)),
        mCand))
      def stream(p: String) = s.readStream
        .schema(s.read.parquet(p).schema)
        .option("maxFilesPerTrigger", "1").parquet(p)
      val result = streaming.StreamingPipeline.run(
        TickPrep(Tables.ticksFromEvents(stream(tDir))),
        stream(mDir).select(col("ts").as("datetime"),
          col("event_id").as("tick_id"), col("value").as("mid"),
          lit(null).cast("double").as("spread")),
        s"$delaySec seconds", med, SpikeThreshold, ConsensusThreshold,
        cutoffMs = flushFireMs, flushFireMs = flushFireMs)
      pipelineStreamingSelect(
        streaming.StreamingPipeline.replayWithRocksDb(s, result))
    }),

    // The composed streaming pipeline BY SYMBOL: aggregations group
    // on (sym, window), the consensus join equates (sym, window), and
    // the tail's transformWithState state partitions BY SYMBOL — the
    // multi-pair production shape, where each key's serial candle
    // logic is an independent state machine sharded by the grouping
    // key. Two documented replay-adapter parameters mirror the batch
    // keyed pipeline's GLOBAL design choices (SURVEY §2.12): the G5
    // median stays global (computed batch-exact, passed as config),
    // and the grid end is global (every symbol bridges to the LAST
    // validated minute across all symbols — a live stream has no
    // end, so the adapter passes it like the flush sentinel). Shares
    // pipeline_hybrid_by_key's oracle.
    "pipeline_hybrid_streaming_by_key_replay" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val half = (lit(0.01) + (col("event_id") % 10) * lit(0.001)) / 2
      def kticksOf(df: DataFrame) = df.select(
        col("ts").as("datetime"), col("event_id").as("tick_id"),
        (col("value") + half).as("ask"),
        (col("value") - half).as("bid"),
        (col("user_id") % 3).as("sym"))
      def km1Of(df: DataFrame) = df.select(
        col("ts").as("datetime"), col("event_id").as("tick_id"),
        col("value").as("mid"), lit(null).cast("double").as("spread"),
        (col("user_id") % 3).as("sym"))
      // batch twins for the two global parameters
      val keys = Seq("sym", "datetime")
      val tCand = Resample.ohlc1min(TickPrep(kticksOf(ev)),
        Seq("sym")).cache()
      val km1 = Resample.ohlc1min(
        km1Of(ev.filter(col("event_type").isin("click", "view"))),
        Seq("sym")).cache()
      val fusedB = FusionOps.combineFirst(
        FusionOps.rejectCatastrophes(tCand,
          FusionOps.catastrophes(tCand, km1, ConsensusThreshold, keys),
          keys),
        km1, keys)
      val med = SpreadOps.medianSpread(fusedB)
      val validated = CleanOps.spikeFilter(
        CleanOps.structuralRepair(
          CleanOps.dropInverted(SpreadOps(fusedB, Seq("sym"))),
          Seq("sym")),
        SpikeThreshold, Seq("sym"))
      val bridgeEnd = Math.floorDiv(
        validated.agg(max(col("datetime"))).head()
          .getTimestamp(0).getTime, 60000L)
      val b = ev.agg(min(col("ts")), max(col("ts"))).head()
      val (mn, mx) = (b.getTimestamp(0).getTime,
        b.getTimestamp(1).getTime)
      val delayMin = (mx - mn) / 60000L + 120
      val flush = new java.sql.Timestamp(
        streaming.StreamingPipeline.weekdaySentinelMs(
          mx + (delayMin + 1440) * 60000L))
      val flushFireMs = mx + 10 * 60000L
      def sentinel(df: DataFrame) = df.limit(1)
        .withColumn("ts", lit(flush))
        .withColumn("value", lit(1.0))
      val m1ev = ev.filter(col("event_type").isin("click", "view"))
      val tDir = Scratch.dir("spk_ticks", dir)
      val mDir = Scratch.dir("spk_m1", dir)
      streaming.StagedReplay.stageFiles(Seq(
        ev.filter(minute(col("ts")) % 3 =!= 2),
        ev.filter(minute(col("ts")) % 3 === 2),
        sentinel(ev)), tDir)
      streaming.StagedReplay.stageFiles(Seq(
        m1ev.filter(minute(col("ts")) % 4 =!= 1),
        m1ev.filter(minute(col("ts")) % 4 === 1),
        sentinel(m1ev)), mDir)
      def stream(p: String) = s.readStream
        .schema(s.read.parquet(p).schema)
        .option("maxFilesPerTrigger", "1").parquet(p)
      val result = streaming.StreamingPipeline.runKeyed(
        TickPrep(kticksOf(stream(tDir))), km1Of(stream(mDir)),
        s"$delayMin minutes", med, SpikeThreshold, ConsensusThreshold,
        cutoffMs = flushFireMs, flushFireMs = flushFireMs,
        bridgeEndMin = bridgeEnd)
      pipelineStreamingSelectKeyed(
        streaming.StreamingPipeline.replayWithRocksDb(s, result))
    }),

    // The KEYED composed pipeline under the late-data discipline:
    // the same g10 staging as the flat late gate, but every operator
    // keyed by symbol — late tick rows drop at the (sym, window)
    // aggregation against the GLOBAL watermark (watermarks are
    // per-source, never per-key: one slow symbol cannot hold back
    // eviction, and one fast one ages the others' state — the
    // multi-tenant reality this gate pins). Oracle = the keyed batch
    // pipeline over exactly the admitted tick set.
    "pipeline_hybrid_streaming_by_key_late_replay" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val half = (lit(0.01) + (col("event_id") % 10) * lit(0.001)) / 2
      def kticksOf(df: DataFrame) = df.select(
        col("ts").as("datetime"), col("event_id").as("tick_id"),
        (col("value") + half).as("ask"),
        (col("value") - half).as("bid"),
        (col("user_id") % 3).as("sym"))
      def km1Of(df: DataFrame) = df.select(
        col("ts").as("datetime"), col("event_id").as("tick_id"),
        col("value").as("mid"), lit(null).cast("double").as("spread"),
        (col("user_id") % 3).as("sym"))
      val m1ev = ev.filter(col("event_type").isin("click", "view"))
      // bands over PREPPED tick event times (the watermark node sits
      // after the prep filters; the keyed prep admits the same rows)
      val mxP = TickPrep(Tables.ticks(s, dir))
        .agg(max(col("datetime"))).head().getTimestamp(0)
      def cutH(h: Long) =
        lit(new java.sql.Timestamp(mxP.getTime - h * 3600000L))
      val isLateDrop = col("event_id") % 7 === 3 &&
        col("ts") < cutH(10)
      val isLateAdmit = col("event_id") % 7 === 4 &&
        col("ts") >= cutH(3) && col("ts") < cutH(2)
      val isStage2 = col("event_id") % 7 === 5 &&
        col("ts") >= cutH(6) && col("ts") < cutH(5)
      val delaySec = 7230L
      val flush = new java.sql.Timestamp(
        streaming.StreamingPipeline.weekdaySentinelMs(
          mxP.getTime + delaySec * 1000L + 1440 * 60000L))
      val flushFireMs = mxP.getTime + 10 * 60000L
      def sentinel(df: DataFrame) = df.limit(1)
        .withColumn("ts", lit(flush))
        .withColumn("value", lit(1.0))
      // batch twins over the ADMITTED keyed tick set
      val mxM1 = m1ev.agg(max(col("ts"))).head()
        .getTimestamp(0).getTime
      val w1Ms = math.min(mxP.getTime, mxM1) - delaySec * 1000L
      val admitted = kticksOf(ev).filter(
        !(col("tick_id") % 7 === 3 && col("datetime") < cutH(10) ||
          col("tick_id") % 7 === 4 && col("datetime") >= cutH(3) &&
            col("datetime") < cutH(2)) ||
        date_trunc("minute", col("datetime")) +
          expr("INTERVAL 1 MINUTE") >
          lit(new java.sql.Timestamp(w1Ms)))
      val keys = Seq("sym", "datetime")
      val tCand = Resample.ohlc1min(TickPrep(admitted),
        Seq("sym")).cache()
      val km1 = Resample.ohlc1min(km1Of(m1ev), Seq("sym")).cache()
      val fusedB = FusionOps.combineFirst(
        FusionOps.rejectCatastrophes(tCand,
          FusionOps.catastrophes(tCand, km1, ConsensusThreshold, keys),
          keys),
        km1, keys)
      val med = SpreadOps.medianSpread(fusedB)
      val validated = CleanOps.spikeFilter(
        CleanOps.structuralRepair(
          CleanOps.dropInverted(SpreadOps(fusedB, Seq("sym"))),
          Seq("sym")),
        SpikeThreshold, Seq("sym"))
      val bridgeEnd = Math.floorDiv(
        validated.agg(max(col("datetime"))).head()
          .getTimestamp(0).getTime, 60000L)
      val tDir = Scratch.dir("spkl_ticks", dir)
      val mDir = Scratch.dir("spkl_m1", dir)
      streaming.StagedReplay.stageFiles(Seq(
        ev.filter(!isLateDrop && !isLateAdmit && !isStage2),
        ev.filter(isStage2),
        ev.filter(isLateDrop || isLateAdmit),
        sentinel(ev)), tDir)
      streaming.StagedReplay.stageFiles(Seq(
        m1ev, sentinel(m1ev)), mDir)
      def stream(p: String) = s.readStream
        .schema(s.read.parquet(p).schema)
        .option("maxFilesPerTrigger", "1").parquet(p)
      val result = streaming.StreamingPipeline.runKeyed(
        TickPrep(kticksOf(stream(tDir))), km1Of(stream(mDir)),
        s"$delaySec seconds", med, SpikeThreshold, ConsensusThreshold,
        cutoffMs = flushFireMs, flushFireMs = flushFireMs,
        bridgeEndMin = bridgeEnd)
      pipelineStreamingSelectKeyed(
        streaming.StreamingPipeline.replayWithRocksDb(s, result))
    }),

    // Validator entry point (validator.py): mismatch report, first 5 by time
    "validator_report" -> ((s, dir) => {
      val t = tickCandles(s, dir)
        .select(col("datetime"), col("close").as("new_close"))
      val m = m1Candles(s, dir)
        .select(col("datetime"), col("close").as("old_close"))
      FusionOps.intersectAlign(t, m)
        .withColumn("diff", abs(col("new_close") - col("old_close")))
        .filter(col("diff") > ConsensusThreshold)
        .orderBy(col("datetime"))
        .limit(5)
        .select(col("datetime"),
          Rounding.duckRound(col("new_close"), 6).as("new_close"),
          Rounding.duckRound(col("old_close"), 6).as("old_close"),
          Rounding.duckRound(col("diff"), 6).as("diff"))
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = coreOracleSql ++ ExtQueries.oracleSql

  private def coreOracleSql: Map[String, String] = Map(

    // reads the fixture the Spark query just wrote — the compare is
    // between the two engines' CSV scan paths, not between derivations
    "s1_csv_m1_scan" ->
      s"""SELECT strptime(Date || ' ' || Time, '%Y.%m.%d %H:%M:%S')
         |    AS datetime,
         |  CAST(Open AS DOUBLE) AS open, CAST(High AS DOUBLE) AS high,
         |  CAST(Low AS DOUBLE) AS low, CAST(Close AS DOUBLE) AS close,
         |  CAST(TickVol AS DOUBLE) AS volume,
         |  CAST(NULL AS DOUBLE) AS spread
         |FROM read_csv('$csvFixtureDir/*.csv', header = true,
         |  columns = {'Date': 'VARCHAR', 'Time': 'VARCHAR',
         |             'Open': 'FLOAT', 'High': 'FLOAT', 'Low': 'FLOAT',
         |             'Close': 'FLOAT', 'TickVol': 'FLOAT'})""".stripMargin,

    "s2_scan_prune" ->
      "SELECT event_id, ts, value FROM events WHERE value >= 0.0001",

    // reads the fixture the Spark query just wrote (same contract as
    // s1): JSON scan vs JSON scan, explicit %f timestamp parse
    "s3_json_scan" ->
      s"""SELECT event_id,
         |  strptime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
         |  event_type, value
         |FROM read_json('$jsonFixtureDir/*.json',
         |  format = 'newline_delimited',
         |  columns = {'event_id': 'BIGINT', 'ts': 'VARCHAR',
         |             'event_type': 'VARCHAR', 'value': 'DOUBLE'})"""
        .stripMargin,

    "p1_parse_timestamp" ->
      ("SELECT event_id, strptime(strftime(ts, '%Y.%m.%d %H:%M:%S'), " +
        "'%Y.%m.%d %H:%M:%S') AS parsed FROM events"),

    "p6_p7_mid_spread" ->
      s"""WITH $ticksCte
         |SELECT tick_id, datetime,
         |  round((ask + bid) / 2, 6) AS mid,
         |  round(ask - bid, 6) AS spread
         |FROM ticks""".stripMargin,

    "p13_date_parts" ->
      ("SELECT event_id, dayofweek(ts) + 1 AS dow_sun1, " +
        "isodow(ts) - 1 AS dow_mon0, hour(ts) AS hr FROM events"),

    "f1_bad_tick_filter" ->
      s"""WITH $ticksCte
         |SELECT tick_id, ask, bid FROM ticks
         |WHERE NOT (ask < 0.0001 OR bid < 0.0001)""".stripMargin,

    "f2_weekend_filter" ->
      s"""WITH $ticksCte
         |SELECT tick_id, datetime FROM ticks
         |WHERE NOT (dayofweek(datetime) = 6
         |        OR (dayofweek(datetime) = 5 AND hour(datetime) >= 22)
         |        OR (dayofweek(datetime) = 0 AND hour(datetime) < 21))""".stripMargin,

    "f4_dropna_close" ->
      ("SELECT event_id, CASE WHEN event_type = 'error' THEN NULL " +
        "ELSE value END AS close FROM events " +
        "WHERE NOT event_type = 'error'"),

    "g1_g2_g3_ohlc_resample" ->
      s"""WITH $ticksCte, $preppedCte
         |${ohlcSelectSql()}""".stripMargin,

    // identical oracle to the plain resample: salting is an internal
    // two-phase decomposition, not a semantic change
    "g1_ohlc_salted" ->
      s"""WITH $ticksCte, $preppedCte
         |${ohlcSelectSql()}""".stripMargin,

    // identical oracle again: partial-merge maintenance is an internal
    // decomposition, not a semantic change
    "g8_incremental_ohlc" ->
      s"""WITH $ticksCte, $preppedCte
         |${ohlcSelectSql()}""".stripMargin,

    // identical oracle: an ORC store round-trip must not change a
    // single value
    "s8_orc_roundtrip_ohlc" ->
      s"""WITH $ticksCte, $preppedCte
         |${ohlcSelectSql()}""".stripMargin,

    // identical oracle once more: a fully-replayed stream must converge
    // to the batch aggregation (VERDICT r3 #3)
    "g1_streaming_replay" ->
      s"""WITH $ticksCte, $preppedCte
         |${ohlcSelectSql()}""".stripMargin,

    // the watermark contract, in SQL: batch OHLC over exactly the rows
    // the staged replay admits — non-stage-3 rows always; stage-3
    // (late) rows iff their window end clears W1, the watermark the
    // late filter sees (max stage-1 event time - 2h; the one-batch lag
    // pinned in StreamingLateDataSpec makes stage 2's eviction
    // watermark the filter for stage 3) — emitted only for windows
    // closing at or before the final watermark (max event time - 2h,
    // tie inclusive)
    "g10_streaming_late_replay" ->
      s"""WITH $ticksCte, $preppedCte,
         |mx AS (SELECT max(datetime) AS m FROM prepped),
         |staged AS (
         |  SELECT p.*, CASE
         |    WHEN datetime >= m - INTERVAL 1 HOUR THEN 4
         |    WHEN tick_id % 7 = 3
         |         AND datetime < m - INTERVAL 10 HOUR THEN 3
         |    WHEN tick_id % 7 = 4
         |         AND datetime >= m - INTERVAL 3 HOUR
         |         AND datetime < m - INTERVAL 2 HOUR THEN 3
         |    WHEN tick_id % 7 = 5
         |         AND datetime >= m - INTERVAL 6 HOUR
         |         AND datetime < m - INTERVAL 5 HOUR THEN 2
         |    ELSE 1 END AS stage
         |  FROM prepped p CROSS JOIN mx),
         |w1 AS (
         |  SELECT max(datetime) - INTERVAL 2 HOUR AS w1
         |  FROM staged WHERE stage = 1),
         |admitted AS (
         |  SELECT s.* FROM staged s CROSS JOIN w1
         |  WHERE stage <> 3
         |     OR date_trunc('minute', datetime) + INTERVAL 1 MINUTE
         |        > w1)
         |SELECT * FROM (
         |  SELECT date_trunc('minute', datetime) AS datetime,
         |    round(first(mid ORDER BY datetime, tick_id), 6) AS open,
         |    round(max(mid), 6) AS high,
         |    round(min(mid), 6) AS low,
         |    round(last(mid ORDER BY datetime, tick_id), 6) AS close,
         |    count(mid) AS volume,
         |    round(avg(spread), 6) AS spread
         |  FROM admitted GROUP BY 1) c
         |WHERE c.datetime + INTERVAL 1 MINUTE
         |      <= (SELECT m - INTERVAL 2 HOUR FROM mx)""".stripMargin,

    "g1_ohlc_by_key" ->
      """WITH prepped AS (
        |  SELECT ts AS datetime, event_id AS tick_id, user_id,
        |         value AS mid FROM events)
        |SELECT user_id, date_trunc('minute', datetime) AS datetime,
        |  round(first(mid ORDER BY datetime, tick_id), 6) AS open,
        |  round(max(mid), 6) AS high,
        |  round(min(mid), 6) AS low,
        |  round(last(mid ORDER BY datetime, tick_id), 6) AS close,
        |  count(mid) AS volume
        |FROM prepped GROUP BY 1, 2""".stripMargin,

    "g5_median_spread" ->
      s"""WITH $ticksCte
         |SELECT round(median(ask - bid), 6) AS median_spread FROM ticks""".stripMargin,

    "g6_count_reductions" ->
      ("SELECT count(*) AS n_rows, count(DISTINCT user_id) AS n_users, " +
        "count(CASE WHEN value < 1.0 THEN 1 END) AS n_small FROM events"),

    "o2_top5_offenders" ->
      ("SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem " +
        "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 5"),

    "j1_reindex_left_join" ->
      s"""$fusionWith
         |SELECT t.datetime, round(t.close, 6) AS tick_close,
         |       round(m.close, 6) AS m1_close
         |FROM tick_candles t LEFT JOIN m1_candles m USING (datetime)""".stripMargin,

    "j2_combine_first" ->
      s"""$fusionWith
         |SELECT COALESCE(t.datetime, m.datetime) AS datetime,
         |  round(coalesce(t.open, m.open), 6) AS open,
         |  round(coalesce(t.high, m.high), 6) AS high,
         |  round(coalesce(t.low, m.low), 6) AS low,
         |  round(coalesce(t.close, m.close), 6) AS close,
         |  coalesce(t.volume, m.volume) AS volume,
         |  round(coalesce(t.spread, m.spread), 6) AS spread
         |FROM tick_candles t FULL OUTER JOIN m1_candles m
         |  ON t.datetime = m.datetime""".stripMargin,

    // the inner interval-join replay converges to the batch interval
    // join: variable-length day windows re-derived in SQL, the same
    // [wstart, wend) containment
    "j7_streaming_interval_join_replay" ->
      """WITH e AS (SELECT epoch_us(ts) // 86400000000 AS dayord, ts,
         |            event_id, value FROM events),
         |d AS (SELECT DISTINCT dayord FROM e),
         |w AS (SELECT dayord,
         |    epoch_ms((dayord*86400 + 7200 + (dayord % 3)*2700) * 1000)
         |      AS wstart,
         |    epoch_ms((dayord*86400 + 7200 + (dayord % 3)*2700
         |              + (45 + (dayord % 4)*30)*60) * 1000) AS wend
         |  FROM d)
         |SELECT e.event_id, e.dayord, w.wstart, e.value
         |FROM e JOIN w ON e.dayord = w.dayord
         |  AND e.ts >= w.wstart AND e.ts < w.wend""".stripMargin,

    // the left-outer replay (with sentinels flushing trailing
    // unmatched events) converges to the batch LEFT join
    "j8_streaming_interval_left_replay" ->
      """WITH e AS (SELECT epoch_us(ts) // 86400000000 AS dayord, ts,
         |            event_id, value FROM events),
         |d AS (SELECT DISTINCT dayord FROM e),
         |w AS (SELECT dayord,
         |    epoch_ms((dayord*86400 + 7200 + (dayord % 3)*2700) * 1000)
         |      AS wstart,
         |    epoch_ms((dayord*86400 + 7200 + (dayord % 3)*2700
         |              + (45 + (dayord % 4)*30)*60) * 1000) AS wend
         |  FROM d)
         |SELECT e.ts, e.event_id, e.dayord, w.wstart, e.value
         |FROM e LEFT JOIN w ON e.dayord = w.dayord
         |  AND e.ts >= w.wstart AND e.ts < w.wend""".stripMargin,

    // the streaming replay converges to EXACTLY the batch fusion →
    // shares the batch J2 oracle verbatim
    "j2_streaming_fusion_replay" ->
      s"""$fusionWith
         |SELECT COALESCE(t.datetime, m.datetime) AS datetime,
         |  round(coalesce(t.open, m.open), 6) AS open,
         |  round(coalesce(t.high, m.high), 6) AS high,
         |  round(coalesce(t.low, m.low), 6) AS low,
         |  round(coalesce(t.close, m.close), 6) AS close,
         |  coalesce(t.volume, m.volume) AS volume,
         |  round(coalesce(t.spread, m.spread), 6) AS spread
         |FROM tick_candles t FULL OUTER JOIN m1_candles m
         |  ON t.datetime = m.datetime""".stripMargin,

    // the keyed fusion: full outer on (sym, datetime), rounding after
    // the coalesce exactly as the flat J2 oracle
    "j2_streaming_fusion_by_key_replay" ->
      """WITH ke AS (
         |  SELECT user_id % 3 AS sym, ts, event_id, value FROM events),
         |kt AS (
         |  SELECT sym, date_trunc('minute', ts) AS datetime,
         |    first(value ORDER BY ts, event_id) AS open,
         |    max(value) AS high, min(value) AS low,
         |    last(value ORDER BY ts, event_id) AS close,
         |    count(value) AS volume
         |  FROM ke GROUP BY 1, 2),
         |km AS (
         |  SELECT user_id % 3 AS sym, date_trunc('minute', ts)
         |      AS datetime,
         |    first(value ORDER BY ts, event_id) AS open,
         |    max(value) AS high, min(value) AS low,
         |    last(value ORDER BY ts, event_id) AS close,
         |    count(value) AS volume
         |  FROM events WHERE event_type IN ('click', 'view')
         |  GROUP BY 1, 2)
         |SELECT COALESCE(t.sym, m.sym) AS sym,
         |  COALESCE(t.datetime, m.datetime) AS datetime,
         |  round(coalesce(t.open, m.open), 6) AS open,
         |  round(coalesce(t.high, m.high), 6) AS high,
         |  round(coalesce(t.low, m.low), 6) AS low,
         |  round(coalesce(t.close, m.close), 6) AS close,
         |  coalesce(t.volume, m.volume) AS volume
         |FROM kt t FULL OUTER JOIN km m
         |  ON t.sym = m.sym AND t.datetime = m.datetime""".stripMargin,

    // the late gate's oracle: the batch full outer join with the
    // join's late-filter predicate applied to the M1 side — a late
    // (minute%4==1) row survives only at or above W1 = min(max tick
    // minute, max on-time M1 minute) − 7230s
    "j2_fusion_late_replay" ->
      s"""$fusionWith,
         |cut AS (
         |  SELECT least(
         |    (SELECT max(datetime) FROM tick_candles),
         |    (SELECT max(datetime) FROM m1_candles
         |     WHERE minute(datetime) % 4 != 1))
         |    - INTERVAL 7230 SECOND AS w1),
         |m_eff AS (
         |  SELECT * FROM m1_candles
         |  WHERE minute(datetime) % 4 != 1
         |     OR datetime >= (SELECT w1 FROM cut))
         |SELECT COALESCE(t.datetime, m.datetime) AS datetime,
         |  round(coalesce(t.open, m.open), 6) AS open,
         |  round(coalesce(t.high, m.high), 6) AS high,
         |  round(coalesce(t.low, m.low), 6) AS low,
         |  round(coalesce(t.close, m.close), 6) AS close,
         |  coalesce(t.volume, m.volume) AS volume,
         |  round(coalesce(t.spread, m.spread), 6) AS spread
         |FROM tick_candles t FULL OUTER JOIN m_eff m
         |  ON t.datetime = m.datetime""".stripMargin,

    "j3_index_intersection" ->
      s"""$fusionWith
         |SELECT t.datetime, round(t.close, 6) AS tick_close,
         |  round(m.close, 6) AS m1_close,
         |  round(abs(t.close - m.close), 6) AS close_diff
         |FROM tick_candles t JOIN m1_candles m USING (datetime)""".stripMargin,

    "f7_f8_consensus_reject" ->
      s"""$fusionWith
         |SELECT datetime, round(close, 6) AS close FROM tick_candles
         |WHERE datetime NOT IN (
         |  SELECT t.datetime FROM tick_candles t
         |  LEFT JOIN m1_candles m USING (datetime)
         |  WHERE abs(t.close - m.close) > CAST(50.0 AS DOUBLE))""".stripMargin,

    "f5_drop_inverted" ->
      s"""WITH $mixedCte
         |SELECT datetime, round(open, 6) AS open, round(high, 6) AS high,
         |  round(low, 6) AS low, round(close, 6) AS close, volume
         |FROM mixed WHERE NOT (low > high)""".stripMargin,

    "u1_structural_repair" ->
      s"""WITH $mixedCte
         |SELECT datetime, round(open, 6) AS open,
         |  round(CASE WHEN bad THEN greatest(open, close, high)
         |             ELSE high END, 6) AS high,
         |  round(CASE WHEN bad THEN least(open, close, low)
         |             ELSE low END, 6) AS low,
         |  round(close, 6) AS close, volume
         |FROM (
         |  SELECT *, (open > high OR open < low
         |          OR close > high OR close < low) AS bad
         |  FROM mixed WHERE NOT (low > high)) t""".stripMargin,

    "f6_spike_filter" -> f6SpikeOracle,

    // day-partitioned backend — same semantics, same oracle
    "f6_spike_day_part" -> f6SpikeOracle,

    "u0_union_audit" ->
      s"""$fusionWith, $mixedCte,
         |pct AS (
         |  SELECT *, lag(close) OVER (ORDER BY datetime) AS lc
         |  FROM tick_candles)
         |SELECT datetime, round(open, 6) AS open, round(high, 6) AS high,
         |  round(low, 6) AS low, round(close, 6) AS close,
         |  CAST(volume AS DOUBLE) AS volume,
         |  'dropped_inverted' AS reason
         |FROM mixed WHERE low > high
         |UNION ALL
         |SELECT datetime, round(open, 6), round(high, 6), round(low, 6),
         |  round(close, 6), CAST(volume AS DOUBLE),
         |  'dropped_volatility_spike'
         |FROM pct
         |WHERE CASE WHEN open = 0 THEN high <> low
         |           ELSE (high - low) / open > CAST(2.0 AS DOUBLE) END
         |   OR CASE WHEN lc IS NULL THEN false
         |           WHEN lc = 0 THEN close <> 0
         |           ELSE abs(close / lc - 1) > CAST(2.0 AS DOUBLE) END
         |UNION ALL
         |SELECT t.datetime, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
         |  CAST(NULL AS DOUBLE), round(t.close, 6), CAST(NULL AS DOUBLE),
         |  'rejected_tick_catastrophe'
         |FROM tick_candles t LEFT JOIN m1_candles m USING (datetime)
         |WHERE abs(t.close - m.close) > CAST(50.0 AS DOUBLE)""".stripMargin,

    "p14_json_props_extract" ->
      ("SELECT event_id, " + // TRY_CAST: Spark's cast yields NULL on junk
        "TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k " +
        "FROM events"),

    "w6_sessionize" ->
      """WITH l AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS tus,
        |    lag(epoch_us(ts)) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS ltus
        |  FROM events)
        |SELECT user_id, event_id,
        |  CAST(sum(CASE WHEN ltus IS NULL OR tus - ltus > 1800000000
        |                THEN 1 ELSE 0 END) OVER
        |    (PARTITION BY user_id ORDER BY tus, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS session_id
        |FROM l""".stripMargin,

    // session membership by the session_window rule: diff <= 30 min
    // merges (touching windows merge), only a strictly larger gap
    // splits — the same boundary as w6's batch `> 1800 s` rule.
    // Sessions are identified by (user, running split count) and
    // compared as per-session aggregates — start, size, last event
    // time.
    "w6_streaming_sessions_replay" ->
      """WITH l AS (
        |  SELECT user_id, ts, event_id,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS lts
        |  FROM events),
        |m AS (
        |  SELECT user_id, ts,
        |    sum(CASE WHEN lts IS NULL
        |             OR epoch_us(ts) - epoch_us(lts) > 1800000000
        |             THEN 1 ELSE 0 END) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM l)
        |SELECT user_id, min(ts) AS session_start,
        |  count(*) AS n_events, max(ts) AS last_ts
        |FROM m GROUP BY user_id, sid""".stripMargin,

    "g7_value_histogram" ->
      """SELECT CAST(floor(value / CAST(50 AS DOUBLE)) AS BIGINT)
        |    AS bucket,
        |  count(*) AS n, round(avg(value), 6) AS avg_value
        |FROM events GROUP BY 1""".stripMargin,

    "w2_lag_pct_change" ->
      """SELECT user_id, event_id,
        |  CASE WHEN lv IS NULL OR lv = 0 THEN NULL
        |       ELSE round(abs(value / lv - 1), 6) END AS pct
        |FROM (
        |  SELECT user_id, event_id, value, lag(value) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id) AS lv
        |  FROM events) t""".stripMargin,

    "w3_ffill_spread" ->
      """WITH s0 AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN event_type = 'error' THEN NULL
        |         ELSE CAST(0.01 AS DOUBLE)
        |              + (event_id % 10) * CAST(0.001 AS DOUBLE)
        |    END AS spread
        |  FROM events)
        |SELECT user_id, event_id,
        |  round(last_value(spread IGNORE NULLS) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS spread
        |FROM s0""".stripMargin,

    "w1_rolling_median" ->
      """SELECT user_id, event_id,
        |  round(median(value) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING), 6) AS med5
        |FROM events""".stripMargin,

    "w7_rolling_mean" ->
      """SELECT user_id, event_id,
        |  round(avg(value) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS mean5
        |FROM events""".stripMargin,

    "u3_median_fill_spread" ->
      """WITH s0 AS (
        |  SELECT event_id,
        |    CASE WHEN event_type = 'error' THEN NULL
        |         ELSE CAST(0.01 AS DOUBLE)
        |              + (event_id % 10) * CAST(0.001 AS DOUBLE)
        |    END AS spread
        |  FROM events)
        |SELECT event_id,
        |  round(coalesce(spread, (SELECT median(spread) FROM s0)), 6)
        |    AS spread
        |FROM s0""".stripMargin,

    // DuckDB's native ASOF LEFT JOIN is the oracle for the union-sort-
    // fill implementation (inclusive >= bound, NULLs for no-match)
    "j5_asof_join" ->
      """WITH cp AS (
        |  SELECT user_id, cp_ts, max(value) AS cp_value
        |  FROM (SELECT user_id, date_trunc('minute', ts) AS cp_ts, value
        |        FROM events) t
        |  WHERE minute(cp_ts) % 5 = 0
        |  GROUP BY 1, 2)
        |SELECT e.event_id, e.ts, e.user_id, e.value,
        |       cp.cp_ts AS asof_ts, cp.cp_value AS asof_cp_value
        |FROM events e ASOF LEFT JOIN cp
        |  ON e.user_id = cp.user_id AND e.ts >= cp.cp_ts""".stripMargin,

    // the tolerance bound nulls the whole match row, exactly as the
    // Spark projection does
    "j5_asof_tolerance" ->
      """WITH cp AS (
        |  SELECT user_id, cp_ts, max(value) AS cp_value
        |  FROM (SELECT user_id, date_trunc('minute', ts) AS cp_ts, value
        |        FROM events) t
        |  WHERE minute(cp_ts) % 5 = 0
        |  GROUP BY 1, 2)
        |SELECT event_id, ts, user_id, value,
        |  CASE WHEN ts - cp_ts <= INTERVAL 120 SECOND THEN cp_ts
        |       END AS asof_ts,
        |  CASE WHEN ts - cp_ts <= INTERVAL 120 SECOND THEN cp_value
        |       END AS asof_cp_value
        |FROM (
        |  SELECT e.event_id, e.ts, e.user_id, e.value,
        |         cp.cp_ts, cp.cp_value
        |  FROM events e ASOF LEFT JOIN cp
        |    ON e.user_id = cp.user_id AND e.ts >= cp.cp_ts)"""
        .stripMargin,

    "j6_range_join" ->
      """WITH bands AS (
        |  SELECT * FROM (VALUES
        |    (0::BIGINT, 0::DOUBLE, 1::DOUBLE),
        |    (1::BIGINT, 1::DOUBLE, 5::DOUBLE),
        |    (2::BIGINT, 5::DOUBLE, 20::DOUBLE),
        |    (3::BIGINT, 20::DOUBLE, 75::DOUBLE),
        |    (4::BIGINT, 75::DOUBLE, 200::DOUBLE),
        |    (5::BIGINT, 200::DOUBLE, 1000::DOUBLE))
        |    t(band_id, lo, hi))
        |SELECT e.event_id, e.value, b.band_id, b.lo, b.hi
        |FROM events e LEFT JOIN bands b
        |  ON e.value >= b.lo AND e.value < b.hi""".stripMargin,

    "o3_topk_per_user" ->
      """SELECT user_id, rnk, event_id, value FROM (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY value DESC, event_id) AS rnk
        |  FROM events) t
        |WHERE rnk <= 3""".stripMargin,

    "t1_minute_grid" ->
      s"""WITH $ticksCte, $preppedCte, $tickCandlesCte, $gridCte
         |SELECT datetime FROM grid""".stripMargin,

    "j4_grid_reindex" ->
      s"""WITH $ticksCte, $preppedCte, $tickCandlesCte, $gridCte
         |SELECT g.datetime, round(c.close, 6) AS close
         |FROM grid g LEFT JOIN tick_candles c USING (datetime)""".stripMargin,

    "u2_flat_candle_bridge" -> u2BridgeOracle,

    // day-partitioned backend — same semantics, same oracle
    "u2_bridge_day_part" -> u2BridgeOracle,

    // streaming replay — a fully-replayed stream through the stateful
    // gap bridge must converge to the batch bridge (VERDICT r5 #4)
    "u2_streaming_bridge_replay" -> u2BridgeOracle,

    "u2_bridge_by_key" -> u2BridgeByKeyOracle,

    // (key, day)-composed backend — same semantics, same oracle
    "u2_bridge_by_key_day_part" -> u2BridgeByKeyOracle,

    "pipeline_hybrid_full" -> pipelineHybridOracle,

    // day-backend twins: same semantics, same oracle (VERDICT r3 #1)
    "pipeline_hybrid_day_part" -> pipelineHybridOracle,

    // mixed backend (r15 #1): W1 via DayWindows, ffill/lag/bridge
    // global — the measured-best large-span shape, same oracle
    "pipeline_hybrid_mixed_part" -> pipelineHybridOracle,

    // auto backend dispatch — same semantics whatever regime fires
    "pipeline_hybrid_auto_part" -> pipelineHybridOracle,

    // the ONE-QUERY streaming composition converges to the batch
    // pipeline (delay > span + sentinel flush) → same oracle
    "pipeline_hybrid_streaming_replay" -> pipelineHybridOracle,

    // tight-watermark variant: the same pipeline over exactly the
    // tick rows the g10 watermark contract admits
    "pipeline_hybrid_streaming_late_replay" ->
      pipelineStreamingLateOracle,

    // the keyed streaming composition converges to the batch keyed
    // pipeline (global median + global grid end as replay-adapter
    // parameters) → same oracle as pipeline_hybrid_by_key
    "pipeline_hybrid_streaming_by_key_replay" -> pipelineKeyedOracle,

    // the streaming tape's anomaly projection converges to the batch
    // audit log → same oracle as pipeline_audit
    "pipeline_audit_streaming_replay" -> pipelineAuditOracle,

    // keyed late variant: the keyed batch pipeline over exactly the
    // admitted tick set (CTE surgery on the keyed oracle)
    "pipeline_hybrid_streaming_by_key_late_replay" ->
      pipelineKeyedStreamingLateOracle,
    "pipeline_audit_day_part" -> pipelineAuditOracle,

    "pipeline_audit" -> pipelineAuditOracle,

    "validator_report" ->
      s"""$fusionWith
         |SELECT t.datetime, round(t.close, 6) AS new_close,
         |  round(m.close, 6) AS old_close,
         |  round(abs(t.close - m.close), 6) AS diff
         |FROM tick_candles t JOIN m1_candles m USING (datetime)
         |WHERE abs(t.close - m.close) > CAST(50.0 AS DOUBLE)
         |ORDER BY t.datetime LIMIT 5""".stripMargin,

    "pipeline_hybrid_by_key" -> pipelineKeyedOracle,

    // (key, day)-composed backend — same semantics, same oracle
    "pipeline_hybrid_by_key_day_part" -> pipelineKeyedOracle,

    // keyed MIXED backend (r16): W1 (sym, day)-parallel, the cheap
    // fills/lag plain-keyed — same semantics, same oracle
    "pipeline_hybrid_by_key_mixed_part" -> pipelineKeyedOracle,

    // keyed auto-dispatch lands in the global regime at gate scale →
    // same oracle as pipeline_hybrid_by_key
    "pipeline_hybrid_by_key_auto_part" -> pipelineKeyedOracle
  )

  /** The composed-pipeline oracle generalized per symbol: every
    * window/join/groupBy carries `sym = user_id % 3`; the G5 median and
    * the minute grid remain GLOBAL (the grid cross-joins the symbol
    * set) — Pipeline.run's exact keyed semantics. */
  private lazy val pipelineKeyedOracle: String =
    s"""WITH kticks AS (
       |  SELECT ts AS datetime, event_id AS tick_id,
       |    value + (CAST(0.01 AS DOUBLE)
       |             + (event_id % 10) * CAST(0.001 AS DOUBLE)) / 2 AS ask,
       |    value - (CAST(0.01 AS DOUBLE)
       |             + (event_id % 10) * CAST(0.001 AS DOUBLE)) / 2 AS bid,
       |    user_id % 3 AS sym
       |  FROM events),
       |kprepped AS (
       |  SELECT *, (ask + bid) / 2 AS mid, ask - bid AS spread
       |  FROM kticks
       |  WHERE NOT (ask < 0.0001 OR bid < 0.0001)
       |    AND NOT (dayofweek(datetime) = 6
       |          OR (dayofweek(datetime) = 5 AND hour(datetime) >= 22)
       |          OR (dayofweek(datetime) = 0 AND hour(datetime) < 21))),
       |ktick_candles AS (
       |  SELECT sym, date_trunc('minute', datetime) AS datetime,
       |    first(mid ORDER BY datetime, tick_id) AS open,
       |    max(mid) AS high, min(mid) AS low,
       |    last(mid ORDER BY datetime, tick_id) AS close,
       |    count(mid) AS volume, avg(spread) AS spread
       |  FROM kprepped GROUP BY 1, 2),
       |km1_candles AS (
       |  SELECT user_id % 3 AS sym, date_trunc('minute', ts) AS datetime,
       |    first(value ORDER BY ts, event_id) AS open,
       |    max(value) AS high, min(value) AS low,
       |    last(value ORDER BY ts, event_id) AS close,
       |    count(*) AS volume, CAST(NULL AS DOUBLE) AS spread
       |  FROM events WHERE event_type IN ('click', 'view')
       |  GROUP BY 1, 2),
       |kcata AS (
       |  SELECT t.sym, t.datetime FROM ktick_candles t
       |  LEFT JOIN km1_candles m
       |    ON t.sym = m.sym AND t.datetime = m.datetime
       |  WHERE abs(t.close - m.close) > CAST(50.0 AS DOUBLE)),
       |kcleaned AS (
       |  SELECT t.* FROM ktick_candles t
       |  ANTI JOIN kcata c
       |    ON t.sym = c.sym AND t.datetime = c.datetime),
       |kfused AS (
       |  SELECT COALESCE(t.sym, m.sym) AS sym,
       |    COALESCE(t.datetime, m.datetime) AS datetime,
       |    coalesce(t.open, m.open) AS open,
       |    coalesce(t.high, m.high) AS high,
       |    coalesce(t.low, m.low) AS low,
       |    coalesce(t.close, m.close) AS close,
       |    coalesce(t.volume, m.volume) AS volume,
       |    coalesce(t.spread, m.spread) AS spread
       |  FROM kcleaned t FULL OUTER JOIN km1_candles m
       |    ON t.sym = m.sym AND t.datetime = m.datetime),
       |kspreadfill AS (
       |  SELECT sym, datetime, open, high, low, close, volume,
       |    coalesce(spread, (SELECT median(spread) FROM kfused))
       |      AS spread
       |  FROM kfused),
       |ksmoothed AS (
       |  SELECT sym, datetime, open, high, low, close, volume,
       |    median(spread) OVER (PARTITION BY sym ORDER BY datetime
       |      ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS spread
       |  FROM kspreadfill),
       |knorminv AS (SELECT * FROM ksmoothed WHERE NOT (low > high)),
       |kmarked AS (
       |  SELECT *, (open > high OR open < low
       |          OR close > high OR close < low) AS bad
       |  FROM knorminv),
       |krepaired AS (
       |  SELECT sym, datetime, open,
       |    CASE WHEN bad THEN greatest(open, close, high)
       |         ELSE high END AS high,
       |    CASE WHEN bad THEN least(open, close, low)
       |         ELSE low END AS low,
       |    close, volume,
       |    last_value(CASE WHEN bad THEN NULL ELSE spread END
       |      IGNORE NULLS) OVER (PARTITION BY sym ORDER BY datetime
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS spread
       |  FROM kmarked),
       |kspiked AS (
       |  SELECT sym, datetime, open, high, low, close, volume, spread
       |  FROM (
       |    SELECT *, lag(close) OVER (PARTITION BY sym
       |      ORDER BY datetime) AS lc
       |    FROM krepaired) t
       |  WHERE NOT (
       |    CASE WHEN open = 0 THEN high <> low
       |         ELSE (high - low) / open > CAST(2.0 AS DOUBLE) END
       |    OR CASE WHEN lc IS NULL THEN false
       |            WHEN lc = 0 THEN close <> 0
       |            ELSE abs(close / lc - 1) > CAST(2.0 AS DOUBLE) END)),
       |kbounds AS (SELECT min(datetime) AS mn, max(datetime) AS mx
       |            FROM kspiked),
       |kgrid AS (
       |  SELECT s.sym, g.datetime FROM (
       |    SELECT unnest(generate_series((SELECT mn FROM kbounds),
       |      (SELECT mx FROM kbounds), INTERVAL 1 minute)) AS datetime) g
       |  CROSS JOIN (SELECT DISTINCT sym FROM kspiked) s),
       |kjoined AS (
       |  SELECT g.sym, g.datetime, s.open, s.high, s.low, s.close,
       |         s.volume, s.spread
       |  FROM kgrid g LEFT JOIN kspiked s
       |    ON g.sym = s.sym AND g.datetime = s.datetime),
       |kbridged AS (
       |  SELECT sym, datetime, open, high, low, volume, spread,
       |    CASE WHEN close IS NULL THEN 1 ELSE 0 END AS is_flat,
       |    last_value(close IGNORE NULLS) OVER w AS fclose,
       |    last_value(spread IGNORE NULLS) OVER w AS fspread
       |  FROM kjoined
       |  WINDOW w AS (PARTITION BY sym ORDER BY datetime
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT sym, datetime,
       |  round(CAST(CAST(CASE WHEN is_flat = 1 THEN fclose ELSE open END
       |    AS REAL) AS DOUBLE), 5) AS open,
       |  round(CAST(CAST(CASE WHEN is_flat = 1 THEN fclose ELSE high END
       |    AS REAL) AS DOUBLE), 5) AS high,
       |  round(CAST(CAST(CASE WHEN is_flat = 1 THEN fclose ELSE low END
       |    AS REAL) AS DOUBLE), 5) AS low,
       |  round(CAST(CAST(fclose AS REAL) AS DOUBLE), 5) AS close,
       |  CAST(CAST(CASE WHEN is_flat = 1 THEN 0 ELSE volume END
       |    AS REAL) AS DOUBLE) AS volume,
       |  round(CAST(CAST(fspread AS REAL) AS DOUBLE), 5) AS spread,
       |  is_flat
       |FROM kbridged WHERE fclose IS NOT NULL""".stripMargin

  /** Keyed late-data oracle: [[pipelineKeyedOracle]] with the tick
    * feed reduced to the rows the g10 watermark contract admits —
    * kprepped becomes the admitted set (stage-3 rows survive iff
    * their minute window outlives W1 = min(max on-time prepped tick
    * time, max M1 event time) − 7230 s), everything downstream
    * identical. Built by CTE surgery on the keyed oracle so the two
    * can never drift. */
  private lazy val pipelineKeyedStreamingLateOracle: String = {
    val lateCtes =
      s"""kmxp AS (SELECT max(datetime) AS m FROM kprepped_all),
         |kstaged AS (
         |  SELECT p.*, CASE
         |    WHEN tick_id % 7 = 3
         |         AND datetime < m - INTERVAL 10 HOUR THEN 3
         |    WHEN tick_id % 7 = 4
         |         AND datetime >= m - INTERVAL 3 HOUR
         |         AND datetime < m - INTERVAL 2 HOUR THEN 3
         |    WHEN tick_id % 7 = 5
         |         AND datetime >= m - INTERVAL 6 HOUR
         |         AND datetime < m - INTERVAL 5 HOUR THEN 2
         |    ELSE 1 END AS stage
         |  FROM kprepped_all p CROSS JOIN kmxp),
         |kw1 AS (SELECT least(
         |         (SELECT max(datetime) FROM kstaged WHERE stage = 1),
         |         (SELECT max(ts) FROM events
         |          WHERE event_type IN ('click', 'view')))
         |       - INTERVAL 7230 SECOND AS w1),
         |kprepped AS (
         |  SELECT s.datetime, s.tick_id, s.ask, s.bid, s.sym, s.mid,
         |         s.spread
         |  FROM kstaged s CROSS JOIN kw1
         |  WHERE stage <> 3
         |     OR date_trunc('minute', s.datetime) + INTERVAL 1 MINUTE
         |        > w1),
         |""".stripMargin
    pipelineKeyedOracle
      .replace("kprepped AS (", "kprepped_all AS (")
      .replace("ktick_candles AS (", lateCtes + "ktick_candles AS (")
  }

  /** Composed-pipeline candle oracle, shared by the global-window and
    * day-partitioned backends (identical semantics by construction). */
  /** Final candle select of the composed-pipeline oracle (float32
    * precision contract mirrored through REAL), shared by the batch
    * and streaming-replay gates. */
  private lazy val pipelineCandleSelect: String =
    """SELECT datetime,
      |  round(CAST(CAST(CASE WHEN is_flat = 1 THEN fclose ELSE open END
      |    AS REAL) AS DOUBLE), 5) AS open,
      |  round(CAST(CAST(CASE WHEN is_flat = 1 THEN fclose ELSE high END
      |    AS REAL) AS DOUBLE), 5) AS high,
      |  round(CAST(CAST(CASE WHEN is_flat = 1 THEN fclose ELSE low END
      |    AS REAL) AS DOUBLE), 5) AS low,
      |  round(CAST(CAST(fclose AS REAL) AS DOUBLE), 5) AS close,
      |  CAST(CAST(CASE WHEN is_flat = 1 THEN 0 ELSE volume END
      |    AS REAL) AS DOUBLE) AS volume,
      |  round(CAST(CAST(fspread AS REAL) AS DOUBLE), 5) AS spread,
      |  is_flat
      |FROM bridged WHERE fclose IS NOT NULL""".stripMargin

  private lazy val pipelineHybridOracle: String =
    s"$pipelineCtes\n$pipelineCandleSelect"

  /** Oracle of the streaming-late composed pipeline: the g10
    * watermark contract applied to the TICK FEED of the full
    * pipeline — stage-3 tick rows are admitted iff their minute
    * window outlives W1 (max prepped event time across stages 1-2
    * minus the 7230 s delay; the one-batch filter lag makes that the
    * watermark batch 3 sees), then the ENTIRE batch pipeline runs on
    * the admitted set. The M1 feed arrives complete in batch 1 and is
    * never late. */
  private lazy val pipelineStreamingLateOracle: String = {
    val preppedAll =
      preppedCte.replaceFirst("prepped AS", "prepped_all AS")
    val prefix =
      s"""WITH $ticksCte, $preppedAll,
         |mxp AS (SELECT max(datetime) AS m FROM prepped_all),
         |staged AS (
         |  SELECT p.*, CASE
         |    WHEN tick_id % 7 = 3
         |         AND datetime < m - INTERVAL 10 HOUR THEN 3
         |    WHEN tick_id % 7 = 4
         |         AND datetime >= m - INTERVAL 3 HOUR
         |         AND datetime < m - INTERVAL 2 HOUR THEN 3
         |    WHEN tick_id % 7 = 5
         |         AND datetime >= m - INTERVAL 6 HOUR
         |         AND datetime < m - INTERVAL 5 HOUR THEN 2
         |    ELSE 1 END AS stage
         |  FROM prepped_all p CROSS JOIN mxp),
         |w1 AS (SELECT least(
         |         (SELECT max(datetime) FROM staged WHERE stage = 1),
         |         (SELECT max(ts) FROM events
         |          WHERE event_type IN ('click', 'view')))
         |       - INTERVAL 7230 SECOND AS w1),
         |prepped AS (
         |  SELECT s.datetime, s.tick_id, s.ask, s.bid, s.mid, s.spread
         |  FROM staged s CROSS JOIN w1
         |  WHERE stage <> 3
         |     OR date_trunc('minute', s.datetime) + INTERVAL 1 MINUTE
         |        > w1),
         |$tickCandlesCte, $m1CandlesCte""".stripMargin
    s"${pipelineCtesFrom(prefix)}\n$pipelineCandleSelect"
  }

  /** Composed-pipeline audit oracle, shared by both backends. */
  private lazy val pipelineAuditOracle: String =
    s"""$pipelineCtes,
       |spike_rows AS (
       |  SELECT datetime, open, high, low, close, volume FROM (
       |    SELECT *, lag(close) OVER (ORDER BY datetime) AS lc
       |    FROM repaired) t
       |  WHERE CASE WHEN open = 0 THEN high <> low
       |             ELSE (high - low) / open > CAST(2.0 AS DOUBLE) END
       |     OR CASE WHEN lc IS NULL THEN false
       |             WHEN lc = 0 THEN close <> 0
       |             ELSE abs(close / lc - 1) > CAST(2.0 AS DOUBLE) END)
       |SELECT datetime, round(open, 5) AS open, round(high, 5) AS high,
       |  round(low, 5) AS low, round(close, 5) AS close,
       |  round(CAST(volume AS DOUBLE), 5) AS volume,
       |  'dropped_inverted' AS reason
       |FROM smoothed WHERE low > high
       |UNION ALL
       |SELECT datetime, round(open, 5), round(high, 5), round(low, 5),
       |  round(close, 5), round(CAST(volume AS DOUBLE), 5),
       |  'fixed_structure_integrity'
       |FROM marked WHERE bad
       |UNION ALL
       |SELECT datetime, round(open, 5), round(high, 5), round(low, 5),
       |  round(close, 5), round(CAST(volume AS DOUBLE), 5),
       |  'dropped_volatility_spike'
       |FROM spike_rows
       |UNION ALL
       |SELECT t.datetime, NULL, NULL, NULL, round(t.close, 5), NULL,
       |  'rejected_tick_catastrophe'
       |FROM tick_candles t LEFT JOIN m1_candles m USING (datetime)
       |WHERE abs(t.close - m.close) > CAST(50.0 AS DOUBLE)
       |UNION ALL
       |SELECT datetime,
       |  round(CAST(CAST(fclose AS REAL) AS DOUBLE), 5),
       |  round(CAST(CAST(fclose AS REAL) AS DOUBLE), 5),
       |  round(CAST(CAST(fclose AS REAL) AS DOUBLE), 5),
       |  round(CAST(CAST(fclose AS REAL) AS DOUBLE), 5),
       |  CAST(CAST(0 AS REAL) AS DOUBLE),
       |  'gap_bridged_flat'
       |FROM bridged WHERE fclose IS NOT NULL AND is_flat = 1""".stripMargin

  /** F6 oracle, shared by the global-window and day-partitioned
    * backends (identical semantics by construction). */
  private lazy val f6SpikeOracle: String =
    s"""WITH $ticksCte, $preppedCte, $tickCandlesCte,
       |pct AS (
       |  SELECT *, lag(close) OVER (ORDER BY datetime) AS lc
       |  FROM tick_candles)
       |SELECT datetime, round(open, 6) AS open, round(high, 6) AS high,
       |  round(low, 6) AS low, round(close, 6) AS close, volume
       |FROM pct
       |WHERE NOT (
       |  CASE WHEN open = 0 THEN high <> low
       |       ELSE (high - low) / open > CAST(2.0 AS DOUBLE) END
       |  OR CASE WHEN lc IS NULL THEN false
       |          WHEN lc = 0 THEN close <> 0
       |          ELSE abs(close / lc - 1) > CAST(2.0 AS DOUBLE) END)""".stripMargin

  /** Per-user bridge on bounded per-user grid slices — shared by the
    * plain keyed bridge and its (key, day)-composed backend twin. */
  private lazy val u2BridgeByKeyOracle: String =
    """WITH ev AS (SELECT * FROM events WHERE user_id < 10),
      |candles AS (
      |  SELECT user_id, date_trunc('minute', ts) AS datetime,
      |    last(value ORDER BY ts, event_id) AS close
      |  FROM ev GROUP BY 1, 2),
      |b AS (SELECT user_id, min(datetime) AS mn, max(datetime) AS mx
      |      FROM candles GROUP BY 1),
      |grid AS (
      |  SELECT user_id,
      |    unnest(generate_series(mn, mx, INTERVAL 1 minute)) AS datetime
      |  FROM b),
      |joined AS (
      |  SELECT g.user_id, g.datetime, c.close
      |  FROM grid g LEFT JOIN candles c
      |    ON g.user_id = c.user_id AND g.datetime = c.datetime),
      |bridged AS (
      |  SELECT user_id, datetime,
      |    CASE WHEN close IS NULL THEN 1 ELSE 0 END AS is_flat,
      |    last_value(close IGNORE NULLS) OVER (PARTITION BY user_id
      |      ORDER BY datetime
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fclose
      |  FROM joined)
      |SELECT user_id, datetime, round(fclose, 6) AS close, is_flat
      |FROM bridged WHERE fclose IS NOT NULL""".stripMargin

  /** U2 oracle, shared by the global-window and day-partitioned
    * backends (identical semantics by construction). */
  private lazy val u2BridgeOracle: String =
    s"""WITH $ticksCte, $preppedCte, $tickCandlesCte, $gridCte,
       |joined AS (
       |  SELECT g.datetime, c.open, c.high, c.low, c.close, c.volume,
       |         c.spread
       |  FROM grid g LEFT JOIN tick_candles c USING (datetime)),
       |bridged AS (
       |  SELECT datetime, open, high, low, volume, spread,
       |    CASE WHEN close IS NULL THEN 1 ELSE 0 END AS is_flat,
       |    last_value(close IGNORE NULLS) OVER w AS fclose,
       |    last_value(spread IGNORE NULLS) OVER w AS fspread
       |  FROM joined
       |  WINDOW w AS (ORDER BY datetime
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT datetime,
       |  round(CASE WHEN is_flat = 1 THEN fclose ELSE open END, 6) AS open,
       |  round(CASE WHEN is_flat = 1 THEN fclose ELSE high END, 6) AS high,
       |  round(CASE WHEN is_flat = 1 THEN fclose ELSE low END, 6) AS low,
       |  round(fclose, 6) AS close,
       |  CASE WHEN is_flat = 1 THEN 0 ELSE volume END AS volume,
       |  round(fspread, 6) AS spread, is_flat
       |FROM bridged WHERE fclose IS NOT NULL""".stripMargin

  /** Shared CTE chain of the composed pipeline oracle (through
    * `bridged`); finals select either the candle output
    * (pipeline_hybrid_full) or the audit log (pipeline_audit). */
  private lazy val pipelineCtes: String = pipelineCtesFrom(fusionWith)

  /** [[pipelineCtes]] with a caller-supplied WITH prefix that must end
    * by defining `tick_candles` and `m1_candles` — the streaming-late
    * oracle swaps in a watermark-filtered tick feed, everything
    * downstream identical. */
  private def pipelineCtesFrom(prefix: String): String =
      s"""$prefix,
         |cata AS (
         |  SELECT t.datetime FROM tick_candles t
         |  LEFT JOIN m1_candles m USING (datetime)
         |  WHERE abs(t.close - m.close) > CAST(50.0 AS DOUBLE)),
         |cleaned AS (
         |  SELECT * FROM tick_candles
         |  WHERE datetime NOT IN (SELECT datetime FROM cata)),
         |fused AS (
         |  SELECT COALESCE(t.datetime, m.datetime) AS datetime,
         |    coalesce(t.open, m.open) AS open,
         |    coalesce(t.high, m.high) AS high,
         |    coalesce(t.low, m.low) AS low,
         |    coalesce(t.close, m.close) AS close,
         |    coalesce(t.volume, m.volume) AS volume,
         |    coalesce(t.spread, m.spread) AS spread
         |  FROM cleaned t FULL OUTER JOIN m1_candles m
         |    ON t.datetime = m.datetime),
         |spreadfill AS (
         |  SELECT datetime, open, high, low, close, volume,
         |    coalesce(spread, (SELECT median(spread) FROM fused)) AS spread
         |  FROM fused),
         |smoothed AS (
         |  SELECT datetime, open, high, low, close, volume,
         |    median(spread) OVER (ORDER BY datetime
         |      ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS spread
         |  FROM spreadfill),
         |norminv AS (SELECT * FROM smoothed WHERE NOT (low > high)),
         |marked AS (
         |  SELECT *, (open > high OR open < low
         |          OR close > high OR close < low) AS bad
         |  FROM norminv),
         |repaired AS (
         |  SELECT datetime, open,
         |    CASE WHEN bad THEN greatest(open, close, high)
         |         ELSE high END AS high,
         |    CASE WHEN bad THEN least(open, close, low)
         |         ELSE low END AS low,
         |    close, volume,
         |    last_value(CASE WHEN bad THEN NULL ELSE spread END
         |      IGNORE NULLS) OVER (ORDER BY datetime
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS spread
         |  FROM marked),
         |spiked AS (
         |  SELECT datetime, open, high, low, close, volume, spread FROM (
         |    SELECT *, lag(close) OVER (ORDER BY datetime) AS lc
         |    FROM repaired) t
         |  WHERE NOT (
         |    CASE WHEN open = 0 THEN high <> low
         |         ELSE (high - low) / open > CAST(2.0 AS DOUBLE) END
         |    OR CASE WHEN lc IS NULL THEN false
         |            WHEN lc = 0 THEN close <> 0
         |            ELSE abs(close / lc - 1) > CAST(2.0 AS DOUBLE) END)),
         |pbounds AS (SELECT min(datetime) AS mn, max(datetime) AS mx
         |            FROM spiked),
         |pgrid AS (
         |  SELECT unnest(generate_series((SELECT mn FROM pbounds),
         |    (SELECT mx FROM pbounds), INTERVAL 1 minute)) AS datetime),
         |joined AS (
         |  SELECT g.datetime, s.open, s.high, s.low, s.close, s.volume,
         |         s.spread
         |  FROM pgrid g LEFT JOIN spiked s USING (datetime)),
         |bridged AS (
         |  SELECT datetime, open, high, low, volume, spread,
         |    CASE WHEN close IS NULL THEN 1 ELSE 0 END AS is_flat,
         |    last_value(close IGNORE NULLS) OVER w AS fclose,
         |    last_value(spread IGNORE NULLS) OVER w AS fspread
         |  FROM joined
         |  WINDOW w AS (ORDER BY datetime
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))"""
        .stripMargin
}
