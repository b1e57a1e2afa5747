package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** G1–G3: 1-minute OHLC resampling (`hybrid_merger.py:100-112`) and the
  * cross-chunk re-aggregation G4 (`:127-133`) it subsumes.
  *
  * pandas: `resample('1min', label='left', closed='left')` then
  * `.ohlc()` + `spread.mean()` + `ask.count()`. The left-label/left-closed
  * bucket is exactly `date_trunc('minute', ts)` floor semantics.
  *
  * Spark design: ONE hash aggregate. open/close are *ordered* first/last
  * within the minute — expressed as `min(struct(ts, tick_id, price))` /
  * `max(struct(...))` so ties on the timestamp break deterministically on
  * `tick_id` (pandas gets determinism from stable row order; `min_by` alone
  * would leave ties arbitrary — SURVEY §7).
  *
  * Scale: this is a single shuffle on the minute key with map-side partial
  * aggregation — Spark's native two-phase hash agg IS the reference's
  * chunk-then-reaggregate loop (G4, `hybrid_merger.py:127-133`) done
  * correctly: no mean-of-chunk-means artifact on spread, no dependence on
  * chunk boundaries. Adding `keyCols` (e.g. symbol) spreads the shuffle and
  * keeps every downstream window partition-parallel.
  */
object Resample {

  /** Ordered-first aggregate: value of `value` at the smallest
    * (orderCol, tieCol). */
  def firstBy(value: Column, orderCol: Column, tieCol: Column): Column =
    min(struct(orderCol.as("o"), tieCol.as("t"), value.as("v"))).getField("v")

  /** Ordered-last aggregate. */
  def lastBy(value: Column, orderCol: Column, tieCol: Column): Column =
    max(struct(orderCol.as("o"), tieCol.as("t"), value.as("v"))).getField("v")

  /** Resample ticks (datetime, tick_id, mid, spread) to 1-minute candles
    * (datetime, open, high, low, close, volume, spread), optionally keyed.
    *
    * volume is G3's "True Tick Volume" — the count of quote updates per
    * minute, not broker-reported volume (`hybrid_merger.py:103`,
    * `README.md:69-73`).
    */
  def ohlc1min(ticks: DataFrame, keyCols: Seq[String] = Nil): DataFrame = {
    val minute = date_trunc("minute", col("datetime")).as("datetime")
    ticks
      .groupBy((keyCols.map(col) :+ minute): _*)
      .agg(
        firstBy(col("mid"), col("datetime"), col("tick_id")).as("open"),
        max(col("mid")).as("high"),
        min(col("mid")).as("low"),
        lastBy(col("mid"), col("datetime"), col("tick_id")).as("close"),
        count(col("mid")).as("volume"),
        avg(col("spread")).as("spread"))
  }

  /** Explicit-salt variant: two-phase aggregation through a salt key,
    * then a second (tiny) aggregate merging the salted partials. Every
    * G1–G3 aggregate decomposes exactly: ordered-first/last
    * re-minimize, min/max re-extremize, count sums, and avg splits into
    * sum+count. Equivalent output to [[ohlc1min]] (verified by test).
    *
    * MEASURED scope (SkewProfileSpec, BENCHNOTES round 7): for
    * [[ohlc1min]]'s decomposable aggregates, Spark's own map-side
    * partial aggregation already collapses a hot minute to one buffer
    * per map task — task-time ratio ~1.0 even with 85% of ticks in one
    * minute — so plain groupBy needs no salt there. Reach for the salt
    * when the partial-agg seam is absent: holistic per-key aggregates
    * (exact percentiles, collect_list assembly) or any custom
    * aggregation whose buffer grows with the group.
    */
  def ohlc1minSalted(ticks: DataFrame, salts: Int = 16,
                     keyCols: Seq[String] = Nil): DataFrame = {
    val minute = date_trunc("minute", col("datetime")).as("datetime")
    val salted = ticks.withColumn("_salt",
      pmod(col("tick_id"), lit(salts)))
    val partial = salted
      .groupBy((keyCols.map(col) ++ Seq(minute, col("_salt"))): _*)
      .agg(
        min(struct(col("datetime").as("o"), col("tick_id").as("t"),
          col("mid").as("v"))).as("omin"),
        max(col("mid")).as("high"),
        min(col("mid")).as("low"),
        max(struct(col("datetime").as("o"), col("tick_id").as("t"),
          col("mid").as("v"))).as("cmax"),
        count(col("mid")).as("volume"),
        sum(col("spread")).as("spread_sum"),
        count(col("spread")).as("spread_n"))
    partial
      .groupBy((keyCols :+ "datetime").map(col): _*)
      .agg(
        min(col("omin")).getField("v").as("open"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        max(col("cmax")).getField("v").as("close"),
        sum(col("volume")).as("volume"),
        (sum(col("spread_sum")) / sum(col("spread_n"))).as("spread"))
  }

  /** Mergeable per-minute partials — the STORABLE form for incremental
    * candle maintenance. Every G1–G3 statistic is kept associative
    * (ordered first/last as struct min/max, avg as sum+count), so a
    * candle store persisted in this form absorbs a late-arriving tick
    * batch by merging partials — no re-read of raw tick history, ever.
    * The reference's append-only chunk loop (`hybrid_merger.py:127-133`)
    * is the degenerate sequential case of exactly this decomposition.
    */
  def ohlcPartials(ticks: DataFrame, keyCols: Seq[String] = Nil): DataFrame = {
    val minute = date_trunc("minute", col("datetime")).as("datetime")
    ticks
      .groupBy((keyCols.map(col) :+ minute): _*)
      .agg(
        min(struct(col("datetime").as("o"), col("tick_id").as("t"),
          col("mid").as("v"))).as("omin"),
        max(col("mid")).as("high"),
        min(col("mid")).as("low"),
        max(struct(col("datetime").as("o"), col("tick_id").as("t"),
          col("mid").as("v"))).as("cmax"),
        count(col("mid")).as("volume"),
        sum(col("spread")).as("spread_sum"),
        count(col("spread")).as("spread_n"))
  }

  /** Merge a stored partial frame with a late batch's partials: union +
    * one candle-cardinality aggregate. Associativity makes the result
    * identical to re-aggregating all raw ticks (property-tested, and
    * `g8_incremental_ohlc` proves it against the full-reaggregation
    * oracle). At scale the store side is day-partitioned parquet
    * ([[graft.sources.ParquetSinks.writeDayPartitioned]]), so a merge
    * reads only the days the delta touches — the shuffle is bounded by
    * the DELTA's minute span, not the store's history. */
  def mergePartials(stored: DataFrame, delta: DataFrame,
                    keyCols: Seq[String] = Nil): DataFrame =
    stored.unionByName(delta)
      .groupBy((keyCols :+ "datetime").map(col): _*)
      .agg(
        min(col("omin")).as("omin"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        max(col("cmax")).as("cmax"),
        sum(col("volume")).as("volume"),
        sum(col("spread_sum")).as("spread_sum"),
        sum(col("spread_n")).as("spread_n"))

  /** Finalize a partial frame to the [[ohlc1min]] output schema. */
  def finishPartials(partials: DataFrame,
                     keyCols: Seq[String] = Nil): DataFrame =
    partials.select((keyCols.map(col) ++ Seq(
      col("datetime"),
      col("omin").getField("v").as("open"),
      col("high"), col("low"),
      col("cmax").getField("v").as("close"),
      col("volume"),
      (col("spread_sum") / col("spread_n")).as("spread"))): _*)

  /** F4: drop empty buckets — minutes with no close
    * (`hybrid_merger.py:115, :134, :241`). With a groupBy-based resample
    * empty minutes never materialize, so this only matters after grid
    * alignment (GridOps); kept for pipeline-shape parity.
    */
  def dropnaClose(candles: DataFrame): DataFrame =
    candles.filter(col("close").isNotNull)
}
