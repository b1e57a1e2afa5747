package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Candle validation & repair: F5, U1, W3, P8, P10, F6 from SURVEY.md §2 —
  * the reference's `validate_and_clean()` (`hybrid_merger.py:145-173`).
  *
  * ⚠ Stage order is semantic (SURVEY §7 hard-part #1): the volatility
  * filter's lag (P10) runs over rows that SURVIVED the inverted-candle drop
  * and structural repair. A naive single select would compute the lag on the
  * raw frame and silently diverge. Each step here materializes its own plan
  * stage in order, exactly like the reference's sequential mutations.
  */
object CleanOps {

  // Conditions are NULL-coalesced to false: pandas NaN comparisons are
  // False, so a candle with a missing field passes every validation
  // filter unchanged. A bare NULL predicate would make BOTH a filter and
  // its audit complement drop the row — it would silently vanish.
  private def invertedCond = coalesce(col("low") > col("high"), lit(false))

  private def structuralBadCond = coalesce(
    col("open") > col("high") || col("open") < col("low") ||
      col("close") > col("high") || col("close") < col("low"), lit(false))

  /** F5: drop inverted candles (`low > high`, `hybrid_merger.py:149-152`). */
  def dropInverted(candles: DataFrame): DataFrame =
    candles.filter(!invertedCond)

  /** Complement of F5 for the audit log (A1, reason `dropped_inverted`). */
  def invertedRows(candles: DataFrame): DataFrame =
    candles.filter(invertedCond)

  /** U1: structural-integrity repair (`hybrid_merger.py:154-161`):
    * where open/close escape [low, high], widen the candle —
    * `high := max(open, close, high)`, `low := min(open, close, low)` —
    * and void the spread (it gets forward-filled by W3).
    */
  def structuralRepair(candles: DataFrame,
                       partitionBy: Seq[String] = Nil): DataFrame =
    // W3: ffill spread over the holes just punched (`hybrid_merger.py:161`)
    repairColumns(candles)
      .withColumn("spread", WindowOps.ffill(col("spread"), partitionBy))
      .drop("was_repaired")

  /** [[structuralRepair]] with the day-partitioned ffill backend
    * ([[DayWindows.ffill]]): identical output, no single-partition
    * window over the full frame — the scale path for single-key
    * frames, composing with a key prefix ((key, day)-parallel). */
  def structuralRepairByDay(candles: DataFrame,
                            keys: Seq[String] = Nil): DataFrame =
    DayWindows.ffill(repairColumns(candles), Seq("spread"),
        Seq("datetime"), keys)
      .drop("was_repaired")

  private def repairColumns(candles: DataFrame): DataFrame =
    // The condition is materialized ONCE before any column is overwritten:
    // re-evaluating it inside the low-repair would resolve against the
    // already-widened high and silently change the predicate.
    candles
      .withColumn("was_repaired", structuralBadCond)
      .withColumn("high",
        when(col("was_repaired"),
          greatest(col("open"), col("close"), col("high")))
          .otherwise(col("high")))
      .withColumn("low",
        when(col("was_repaired"),
          least(col("open"), col("close"), col("low")))
          .otherwise(col("low")))
      .withColumn("spread",
        when(col("was_repaired"), lit(null)).otherwise(col("spread")))

  /** Rows U1 repaired, for the audit log (reason
    * `fixed_structure_integrity`). */
  def structuralBadRows(candles: DataFrame): DataFrame =
    candles.filter(structuralBadCond)

  /** F6 (+P8, P10): volatility-spike filter (`hybrid_merger.py:163-171`).
    * Drop candles whose amplitude `(high-low)/open` or absolute close
    * pct-change exceeds `threshold` (reference default 0.005).
    * The first row's pct_change is NULL → predicate NULL → row kept,
    * matching pandas' NaN comparison semantics.
    */
  /** The F6 drop condition with pandas/IEEE division semantics. Spark's
    * non-ANSI `x/0` is NULL, but pandas yields ±inf (breach) for `x≠0`
    * and NaN (no breach: `NaN > t` is False) for `0/0`; a first-row NULL
    * lag is NaN in pandas → no breach. Spelled out as CASEs so the plan
    * is NULL-free and matches the reference bit-for-bit. */
  private def spikeDropCond(threshold: Double,
                            partitionBy: Seq[String]) =
    spikeCondsFrom(WindowOps.lag1(col("close"), partitionBy), threshold)

  private def spikeCondsFrom(lagClose: Column, threshold: Double) = {
    val ampBreach = coalesce(
      when(col("open") === 0, col("high") =!= col("low"))
        .otherwise((col("high") - col("low")) / col("open") > threshold),
      lit(false))
    val pctBreach = coalesce(
      when(lagClose.isNull, lit(false))
        .otherwise(when(lagClose === 0, col("close") =!= 0)
          .otherwise(abs(col("close") / lagClose - 1) > threshold)),
      lit(false))
    (ampBreach, pctBreach)
  }

  def spikeFilter(candles: DataFrame, threshold: Double = 0.005,
                  partitionBy: Seq[String] = Nil): DataFrame = {
    val (amp, pct) = spikeDropCond(threshold, partitionBy)
    candles.withColumn("_drop", amp || pct)
      .filter(!col("_drop")).drop("_drop")
  }

  /** [[spikeFilter]] with the day-partitioned lag backend
    * ([[DayWindows.lag1]]): identical output, no single-partition
    * window — the scale path for single-key candle frames. */
  def spikeFilterByDay(candles: DataFrame,
                       threshold: Double = 0.005,
                       keys: Seq[String] = Nil): DataFrame =
    spikeSplitByDay(candles, threshold, keepBreaches = false, keys)

  /** Complement of F6 for the audit log (reason
    * `dropped_volatility_spike`). */
  def spikeRows(candles: DataFrame, threshold: Double = 0.005,
                partitionBy: Seq[String] = Nil): DataFrame = {
    val (amp, pct) = spikeDropCond(threshold, partitionBy)
    candles.withColumn("_drop", amp || pct)
      .filter(col("_drop")).drop("_drop")
  }

  /** [[spikeRows]] on the day-partitioned lag backend — the audit
    * complement of [[spikeFilterByDay]]. */
  def spikeRowsByDay(candles: DataFrame,
                     threshold: Double = 0.005,
                     keys: Seq[String] = Nil): DataFrame =
    spikeSplitByDay(candles, threshold, keepBreaches = true, keys)

  private def spikeSplitByDay(candles: DataFrame, threshold: Double,
                              keepBreaches: Boolean,
                              keys: Seq[String] = Nil): DataFrame = {
    val withLag = DayWindows.lag1(candles, "close", "_dw_lc",
      Seq("datetime"), keys)
    val (amp, pct) = spikeCondsFrom(col("_dw_lc"), threshold)
    val drop = amp || pct
    withLag.withColumn("_drop", if (keepBreaches) drop else !drop)
      .filter(col("_drop")).drop("_drop", "_dw_lc")
  }

  /** The full validate-and-clean stage in reference order:
    * F5 → U1(+W3) → F6. */
  def apply(candles: DataFrame, threshold: Double = 0.005,
            partitionBy: Seq[String] = Nil): DataFrame =
    spikeFilter(structuralRepair(dropInverted(candles), partitionBy),
      threshold, partitionBy)
}
