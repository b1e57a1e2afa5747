package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spread recovery: G5, U3, W1 from SURVEY.md §2 —
  * `hybrid_merger.py:204-211`.
  *
  * G5's median is a scalar consumed by U3 — the one genuine multi-pass
  * constraint in the reference (SURVEY §3): Spark must run a small action
  * (one row collected) before the rest of the plan is built, the same
  * two-job shape as pandas' two passes. The collect is O(1) driver memory;
  * the median itself is computed distributed.
  */
object SpreadOps {

  /** G5: global median of spread (exact percentile,
    * `hybrid_merger.py:205`). Returns 0.0 when every spread is NULL
    * (reference's no-ticks fallback, `:207-208`). */
  def medianSpread(df: DataFrame): Double = {
    val row = graft.TwoPass.scalar(
      df.agg(percentile(col("spread"), lit(0.5)).as("m")))
    if (row.isNullAt(0)) 0.0 else row.getDouble(0)
  }

  /** U3: scalar fillna — `spread.fillna(median)`
    * (`hybrid_merger.py:204-208`). */
  def fillSpread(df: DataFrame, median: Double): DataFrame =
    df.withColumn("spread", coalesce(col("spread"), lit(median)))

  /** W1: centered rolling-median smoothing, window=5, min_periods=1
    * (`hybrid_merger.py:210-211`). */
  def smoothSpread(df: DataFrame, partitionBy: Seq[String] = Nil): DataFrame =
    df.withColumn("spread",
      WindowOps.rollingMedian5(col("spread"), partitionBy))

  /** [[smoothSpread]] with the day-partitioned rolling-median backend
    * ([[DayWindows.rollingMedian5]]): identical output, no
    * single-partition window over the full frame — the scale path for
    * single-key candle frames, composing with a key prefix for skewed
    * multi-symbol frames (the window runs (key, day)-parallel). */
  def smoothSpreadByDay(df: DataFrame,
                        keys: Seq[String] = Nil): DataFrame =
    DayWindows.rollingMedian5(df, "spread", "spread", Seq("datetime"),
      keys)

  /** The full spread stage: median fill then rolling smoothing. */
  def apply(df: DataFrame, partitionBy: Seq[String] = Nil): DataFrame =
    smoothSpread(fillSpread(df, medianSpread(df)), partitionBy)

  /** [[apply]] on the day-partitioned window backend. */
  def applyByDay(df: DataFrame, keys: Seq[String] = Nil): DataFrame =
    smoothSpreadByDay(fillSpread(df, medianSpread(df)), keys)
}
