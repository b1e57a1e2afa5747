package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream INTERVAL (time-band) join — the second supported
  * stream-stream join shape after [[StreamingFusion]]'s equi-join on
  * the event-time column: events pair with variable-length windows
  * via a RANGE condition on event time, the streaming twin of the
  * batch range join family ([[graft.ops.RangeJoin]], SURVEY §2.12).
  *
  * Semantics and state math: both sides watermark their event-time
  * column; the join carries (a) a plain equality on the window key —
  * stream-stream joins hash-partition on equalities, so state
  * co-locates by key — and (b) the CANONICAL time band
  * `ev.ts ∈ [w.wstart, w.wstart + maxSpan]`, which is the form
  * Spark's state-watermark analysis understands: each side's buffered
  * rows become evictable once the other side's watermark passes their
  * time plus the band width. The actual (variable, per-window) end
  * `ev.ts < w.wend` rides along as a residual predicate — it filters
  * matches but the STATE BOUND comes from the canonical band, so
  * state never depends on data values. An INNER join emits matches in
  * the micro-batch where the second side arrives, so a bounded
  * `AvailableNow` replay converges to exactly the batch interval join
  * with no end-of-data sentinel (nothing is held back for outer-null
  * flushing — the property the full-outer fusion gates do need the
  * sentinel for).
  *
  * Scale: the 100 TB enrichment topology — an event firehose joined
  * to a (much smaller but still streaming) window/campaign feed.
  * Per-key state is bounded by watermark delay + band width, rows
  * partition by the equality key across executors, and the residual
  * predicate costs nothing extra. Events arriving before their
  * window AND windows arriving before their events both buffer
  * symmetrically (pinned by the staged replay gate, which delivers
  * the sides in opposite orders).
  */
object StreamingIntervalJoin {

  /** Inner-join an event stream (event-time `ts`, key `dayord`) to a
    * window stream (`dayord`, `wstart`, `wend`): equality on the key,
    * canonical band `ts ∈ [wstart, wstart + maxSpan]` for the state
    * bound, residual `ts < wend` for the true variable window end. */
  def eventsInWindows(events: DataFrame, windows: DataFrame,
                      delay: String, maxSpan: String): DataFrame = {
    val ev = events.withWatermark("ts", delay).alias("ev")
    val w = windows.withWatermark("wstart", delay).alias("w")
    ev.join(w,
      expr(s"""ev.dayord = w.dayord
               AND ev.ts >= w.wstart
               AND ev.ts <= w.wstart + interval $maxSpan
               AND ev.ts < w.wend"""), "inner")
      .select(col("ev.event_id"), col("ev.dayord"), col("w.wstart"),
        col("ev.value"))
  }

  /** LEFT-OUTER form: every event emits — matched events in the
    * micro-batch where both sides are present, UNMATCHED events only
    * when the watermark passes their state bound (event time + band
    * width), the point Spark can prove no future window will match.
    * A bounded replay therefore needs the fusion gates' sentinel
    * discipline: a final stage on both sides advances the watermark
    * past end-of-data or the trailing null rows never flush. */
  def eventsInWindowsLeft(events: DataFrame, windows: DataFrame,
                          delay: String, maxSpan: String): DataFrame = {
    val ev = events.withWatermark("ts", delay).alias("ev")
    val w = windows.withWatermark("wstart", delay).alias("w")
    ev.join(w,
      expr(s"""ev.dayord = w.dayord
               AND ev.ts >= w.wstart
               AND ev.ts <= w.wstart + interval $maxSpan
               AND ev.ts < w.wend"""), "leftOuter")
      .select(col("ev.ts"), col("ev.event_id"), col("ev.dayord"),
        col("w.wstart"), col("ev.value"))
  }
}
