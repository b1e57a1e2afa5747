package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops._

/** The full reference-equivalent pipeline: `HybridDataMerger.run()`
  * (`hybrid_merger.py:175-251`), composed from the §2 operators in exact
  * stage order (SURVEY §3):
  *
  * {{{
  * ticks --TickPrep(F1,F2,P6,P7)--> Resample(G1-G3) --> tick candles
  * tick candles × m1 --consensus(J1,P9,F7,F8,A1)--> cleaned tick candles
  * cleaned × m1 --combineFirst(J2)--> fused
  * fused --SpreadOps(G5,U3,W1)--> spread-recovered
  * --CleanOps(F5,U1,W3,F6,A1)--> validated
  * --GridOps(T1,J4,W4,U2,F4)--> gap-free 1-min series
  * --finalCast(P12)--> float32/int8 output
  * }}}
  *
  * Everything is one lazy Catalyst plan except two deliberate driver
  * actions: the min/max timestamp bounds for the grid and G5's scalar
  * median (the reference's own two-pass shape, SURVEY §3).
  */
object Pipeline {

  /** @param release unpersists the frames `run` cached; call once every
    *                 action on `candles`/`audit` has completed (library
    *                 callers invoking `run` repeatedly in one session
    *                 must release, or caches accumulate). */
  case class Result(candles: DataFrame, audit: DataFrame,
                    release: () => Unit)

  /** @param ticks canonical tick frame: datetime, tick_id, ask, bid
    * @param m1 optional legacy candle frame: datetime, open..close,
    *           volume, spread (NULL ok)
    * @param partitionBy optional symbol-style keys present in BOTH inputs;
    *                    generalizes every window/groupBy (SURVEY §2.12)
    * @param dayWindows route every global-time-order window stage (W1
    *                   smoothing, U1's W3 ffill, F6's lag, the W4/W5
    *                   bridge) through the day-partitioned [[DayWindows]]
    *                   backends — identical output, but no WindowExec over
    *                   the FULL frame collapses to one task. The only
    *                   remaining unpartitioned windows run over O(days)
    *                   patch / edge-strip tables (bounded by the calendar
    *                   span, never data volume). Composes with
    *                   `partitionBy` (r8): keyed windows then run
    *                   (key, day)-parallel — the shape for SKEWED symbol
    *                   distributions, where a plain keyed window still
    *                   serializes the dominant key's whole span into one
    *                   task.
    * @param w1Day per-stage override of `dayWindows` for the W1 rolling-
    *              median smoothing alone. The r15 ScaleProbe measured the
    *              crossover (SCALE.md): at 100× span the day backend wins
    *              ONLY where the per-row window work is superlinear — W1's
    *              sorted 5-row median (4.65 s vs 9.02 s global) — and
    *              LOSES for the trivial ffill/lag windows, whose exchanges
    *              cost more than the serialization they remove. The
    *              measured-best large-span single-key shape is therefore
    *              the MIXED run: `w1Day = Some(true)` with everything else
    *              global (gated as `pipeline_hybrid_mixed_part`).
    * @param fillLagDay per-stage override of `dayWindows` for the cheap
    *                   sequential stages: U1's W3 ffill, F6's lag, and
    *                   the W4/W5 grid bridge.
    */
  /** The measured three-regime backend rule (SCALE.md §r16, probed at
    * 100×/1000× of sf0.1): below ~1 M candle rows per key every
    * backend tax loses — stay global; between ~1 M and ~10 M only
    * W1's superlinear rolling median is worth day-routing (the MIXED
    * winner at 2.8 M); past ~10 M the chained global single-task
    * stages themselves become the straggler — day-route everything
    * (the all-day winner at 28 M). Returns (w1Day, fillLagDay). */
  def chooseBackends(candleRows: Long): (Boolean, Boolean) =
    if (candleRows < 1000000L) (false, false)
    else if (candleRows < 10000000L) (true, false)
    else (true, true)

  /** The row count the auto dispatch regimes key on: the TOTAL candle
    * count for a single-series run, but the DOMINANT key's span for a
    * keyed run (VERDICT r16 #1) — a global window serializes the whole
    * frame into one task, a keyed window serializes each key's span,
    * so the straggler is max-per-key, not the sum. One tiny
    * per-key-count aggregate over the (cached) candle frame. */
  def dispatchRows(candles: DataFrame, partitionBy: Seq[String]): Long =
    if (partitionBy.isEmpty) candles.count()
    else {
      // an EMPTY keyed frame has zero groups, so max(count) is a NULL
      // scalar (ADVICE r17): dispatch on 0 rows — the global regime —
      // like the single-series count() path does
      val r = TwoPass.scalar(candles.groupBy(partitionBy.map(col): _*)
        .count().agg(max(col("count"))))
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }

  /** Backend-precedence resolution (pinned by PipelineSpec):
    * per-stage `w1Day`/`fillLagDay` win outright; next an explicit
    * `dayWindows = true` wins over `autoWindows` (ADVICE r16 — auto
    * must not silently discard a requested all-day run); only with
    * `dayWindows` at its false default does `autoWindows` apply the
    * measured [[chooseBackends]] regimes to `rows`. */
  def resolveBackends(rows: => Long, dayWindows: Boolean,
                      autoWindows: Boolean, w1Day: Option[Boolean],
                      fillLagDay: Option[Boolean]): (Boolean, Boolean) = {
    val (autoW1, autoFill) =
      if (autoWindows && !dayWindows) chooseBackends(rows)
      else (dayWindows, dayWindows)
    (w1Day.getOrElse(autoW1), fillLagDay.getOrElse(autoFill))
  }

  /** @param autoWindows pick the window backends from the measured
    *                    three-regime rule ([[chooseBackends]]) applied
    *                    to [[dispatchRows]] — the candle count `run`
    *                    materializes anyway for its cache pin
    *                    (single-series: zero extra actions), or the
    *                    dominant key's count for keyed runs (one tiny
    *                    agg on the cached frame). Explicit per-stage
    *                    `w1Day`/`fillLagDay` override it, and so does
    *                    an explicit `dayWindows = true`
    *                    ([[resolveBackends]]). */
  def run(spark: SparkSession, ticks: DataFrame, m1: Option[DataFrame],
          spikeThreshold: Double = 0.005, consensusThreshold: Double = 0.01,
          partitionBy: Seq[String] = Nil,
          dayWindows: Boolean = false,
          w1Day: Option[Boolean] = None,
          fillLagDay: Option[Boolean] = None,
          autoWindows: Boolean = false): Result = {

    // Stage 1-2: tick prep + 1-minute resample (the "Superior Candles").
    // Cached: the candle frame feeds three join branches (consensus,
    // anti-join, fusion) — without caching each branch re-runs the full
    // scan+aggregate. Candle cardinality is time-span-bounded, so the
    // cache is small even when the tick input is 100 TB.
    val prepped = TickPrep(ticks)
    val tickCandles = Resample.ohlc1min(prepped, partitionBy).cache()
    // eager: unmaterialized caches rebuild per branch. The count also
    // feeds autoWindows for single-series runs; keyed runs dispatch on
    // the DOMINANT key's span instead (dispatchRows — the per-key
    // window straggler is the max, not the sum), computed lazily so a
    // non-auto run never pays the per-key agg.
    val nCandles = tickCandles.count()
    m1.foreach { df => df.cache(); df.count() }
    val (w1ByDay, fillByDay) = resolveBackends(
      if (partitionBy.isEmpty) nCandles
      else dispatchRows(tickCandles, partitionBy),
      dayWindows, autoWindows, w1Day, fillLagDay)

    // Stage 3: consensus cross-check against the legacy feed
    val keys = partitionBy :+ "datetime"
    val (fused, cataAudit) = m1 match {
      case Some(m1df) =>
        val cata = FusionOps.catastrophes(tickCandles, m1df,
          consensusThreshold, keys)
        val cleaned = FusionOps.rejectCatastrophes(tickCandles, cata, keys)
        (FusionOps.combineFirst(cleaned, m1df, keys),
          Some(AuditOps.tag(
            cata.withColumnRenamed("tick_close", "close"),
            AuditOps.ReasonRejectedCatastrophe, partitionBy)))
      case None => (tickCandles, None)
    }

    // Stage 4: spread recovery — scalar median fill + rolling smoothing.
    // Cached: spreadDone feeds THREE consumers (the F5 audit complement,
    // the survivor path, and — via repaired — the F6 pair), and its plan
    // carries the W1 window stage; without the cache every audit branch
    // re-runs it. Like tickCandles, its cardinality is candle-bounded, so
    // the cache stays small at any tick volume.
    val spreadDone = (
      if (w1ByDay) SpreadOps.applyByDay(fused, partitionBy)
      else SpreadOps(fused, partitionBy)).cache()

    // Stage 5: validation & repair (audit complements computed explicitly)
    val inverted = CleanOps.invertedRows(spreadDone)
    val noInverted = CleanOps.dropInverted(spreadDone)
    val structBad = CleanOps.structuralBadRows(noInverted)
    // Cached for the same reason: repaired feeds the F6 filter AND its
    // audit complement, and its plan carries the U1/W3 ffill stage.
    val repaired = (
      if (fillByDay)
        CleanOps.structuralRepairByDay(noInverted, partitionBy)
      else CleanOps.structuralRepair(noInverted, partitionBy)).cache()
    val spikes =
      if (fillByDay)
        CleanOps.spikeRowsByDay(repaired, spikeThreshold, partitionBy)
      else CleanOps.spikeRows(repaired, spikeThreshold, partitionBy)
    val validated =
      if (fillByDay)
        CleanOps.spikeFilterByDay(repaired, spikeThreshold, partitionBy)
      else CleanOps.spikeFilter(repaired, spikeThreshold, partitionBy)

    // Stage 6: immutable time grid + flat-candle gap bridging
    val bounds = TwoPass.scalar(
      validated.agg(min(col("datetime")), max(col("datetime"))))
    val result =
      if (bounds.isNullAt(0)) GridOps.finalCast(validated
        .withColumn("is_flat", lit(0)))
      else {
        val grid0 = GridOps.minuteGrid(spark,
          bounds.getTimestamp(0), bounds.getTimestamp(1))
        val grid =
          if (partitionBy.isEmpty) grid0
          else grid0.crossJoin(
            validated.select(partitionBy.map(col): _*).distinct())
        GridOps.finalCast(
          if (fillByDay)
            GridOps.flatCandleBridgeByDay(validated, grid, partitionBy)
          else GridOps.flatCandleBridge(validated, grid, partitionBy))
      }

    val audit = AuditOps.union(Seq(
      AuditOps.tag(inverted, AuditOps.ReasonDroppedInverted, partitionBy),
      AuditOps.tag(structBad, AuditOps.ReasonFixedStructure, partitionBy),
      AuditOps.tag(spikes, AuditOps.ReasonDroppedSpike, partitionBy)) ++
      cataAudit.toSeq ++
      Seq(AuditOps.tag(result.filter(col("is_flat") === 1),
        AuditOps.ReasonGapBridged, partitionBy)))

    Result(result, audit, () => {
      tickCandles.unpersist()
      spreadDone.unpersist()
      repaired.unpersist()
      m1.foreach(_.unpersist())
    })
  }
}
