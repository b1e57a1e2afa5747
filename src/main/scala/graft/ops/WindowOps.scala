package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Time-order window helpers: W1–W5 from SURVEY.md §2.6.
  *
  * The reference assumes one global time order (its pandas DatetimeIndex).
  * A Spark window without `partitionBy` collapses to a single task — fine
  * for a bounded 1-minute candle grid (rows scale with the time span, not
  * tick volume: 15 years ≈ 7.9M minutes), wrong for raw-tick-scale data.
  * Every helper therefore takes `partitionBy` keys; the candle pipeline
  * passes the symbol key when present (SURVEY §2.12), and [[DayWindows]]
  * provides exact day-partitioned backends (day windows + broadcast
  * boundary patch) for single-key frames.
  */
object WindowOps {

  def timeWindow(partitionBy: Seq[String], orderBy: Seq[String]): WindowSpec = {
    val base =
      if (partitionBy.isEmpty) Window.partitionBy()
      else Window.partitionBy(partitionBy.map(col): _*)
    base.orderBy(orderBy.map(col): _*)
  }

  /** W3/W4/W5: forward-fill — `last(col, ignoreNulls)` over an
    * unbounded-preceding frame (pandas `ffill`, `hybrid_merger.py:161,
    * :231, :239`). */
  def ffill(c: Column, partitionBy: Seq[String] = Nil,
            orderBy: Seq[String] = Seq("datetime")): Column =
    last(c, ignoreNulls = true)
      .over(timeWindow(partitionBy, orderBy)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))

  /** W2: previous-row value (pandas `shift(1)` inside `pct_change`,
    * `hybrid_merger.py:165`). */
  def lag1(c: Column, partitionBy: Seq[String] = Nil,
           orderBy: Seq[String] = Seq("datetime")): Column =
    lag(c, 1).over(timeWindow(partitionBy, orderBy))

  /** W1: centered rolling median, window=5, min_periods=1
    * (`hybrid_merger.py:210-211`). Spark's shrinking frame at partition
    * edges matches `min_periods=1` exactly.
    *
    * Computed as the interpolated middle of `sort_array(collect_list)`
    * over the 5-row frame instead of `percentile(c, 0.5)`: sorting ≤5
    * elements per frame is cheaper than percentile's per-frame counts
    * map, and the whole expression stays codegen-friendly.
    */
  def rollingMedian5(c: Column, partitionBy: Seq[String] = Nil,
                     orderBy: Seq[String] = Seq("datetime")): Column =
    median5FromSorted(sort_array(collect_list(c)
      .over(timeWindow(partitionBy, orderBy).rowsBetween(-2, 2))))

  /** Exact 0.5-percentile of a small sorted array with linear
    * interpolation — `lo + (hi − lo) · 0.5`, the SAME formula Spark's
    * `percentile` and DuckDB's window `median` evaluate, so results stay
    * bit-identical with both (odd n: lo == hi, exact). collect_list skips
    * NULLs exactly like percentile, so the shrink semantics agree too. */
  private[ops] def median5FromSorted(arr: Column): Column = {
    val n = size(arr)
    val lo = element_at(arr, floor((n + lit(1)) / lit(2)).cast("int"))
    val hi = element_at(arr, floor(n / lit(2)).cast("int") + lit(1))
    when(n === 0, lit(null)).otherwise(lo + (hi - lo) * lit(0.5))
  }

  /** Trailing rolling mean, window=5, min_periods=1 — the smoothing
    * sibling of [[rollingMedian5]] (pandas `rolling(5).mean()`). The
    * shrinking frame at partition starts matches `min_periods=1`; the
    * ≤5-value frame sum is order-fixed (row order), so cross-engine
    * parity only needs the output rounding both engines already apply. */
  def rollingMean5(c: Column, partitionBy: Seq[String] = Nil,
                   orderBy: Seq[String] = Seq("datetime")): Column =
    avg(c).over(timeWindow(partitionBy, orderBy).rowsBetween(-4, 0))
}
