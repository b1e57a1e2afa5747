package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Rounding

/** Schema-driven dataset profiling — the data-quality snapshot a
  * training pipeline records before/after each curation stage (null
  * budgets, range drift, cardinality explosions).
  *
  * One pass, one row out: every statistic is an aggregate column in a
  * SINGLE hash-free global aggregation (partial-aggregated map-side,
  * one 1-row exchange), so profiling a 100 TB table costs one scan.
  * Statistics are chosen per column type from the schema: null counts
  * everywhere; min/max/avg/stddev for numerics (floats rounded — the
  * only accumulation-order-sensitive outputs); min/max for timestamps;
  * exact distinct counts for strings (swap for approx_count_distinct at
  * extreme cardinalities).
  */
object DataProfile {

  /** @param approx swap the exact string-cardinality counts for
    *               `approx_count_distinct` (HyperLogLog) — the
    *               extreme-cardinality form: the sketch is mergeable
    *               map-side, so a 100 TB profile never shuffles distinct
    *               values, only fixed-size HLL registers. The sketch is
    *               engine-specific (Spark HLL++ ≠ DuckDB's), so the
    *               approx profile has no hash oracle twin — the driver
    *               records rows/schema only, same class as e13. */
  def profile(df: DataFrame, approx: Boolean = false): DataFrame = {
    val aggs: Seq[Column] = df.schema.fields.toSeq.flatMap { f =>
      val c = col(f.name)
      val nulls =
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"${f.name}_nulls")
      f.dataType match {
        case _: NumericType => Seq(nulls,
          min(c).as(s"${f.name}_min"), max(c).as(s"${f.name}_max"),
          Rounding.duckRound(avg(c), 6).as(s"${f.name}_avg"),
          Rounding.duckRound(stddev_samp(c), 6).as(s"${f.name}_std"))
        case _: TimestampType => Seq(nulls,
          min(c).as(s"${f.name}_min"), max(c).as(s"${f.name}_max"))
        case _: StringType => Seq(nulls,
          (if (approx) approx_count_distinct(c) else countDistinct(c))
            .as(s"${f.name}_distinct"))
        case _ => Seq(nulls)
      }
    }
    val all = count(lit(1)).as("n_rows") +: aggs
    df.agg(all.head, all.tail: _*)
  }

  /** Per-group exact quantiles of one numeric column (p25/p50/… named by
    * percent) — the distribution-drift snapshot between curation stages.
    *
    * `percentile` is the exact interpolated form (identical to DuckDB's
    * `quantile_cont`): it buffers each group's values, so it is the right
    * tool while per-group cardinality is bounded; at extreme group sizes
    * swap for `percentile_approx`, which is mergeable and streams.
    */
  def groupedQuantiles(df: DataFrame, key: Column, value: Column,
      qs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.9, 0.99)): DataFrame = {
    val aggs = count(lit(1)).as("n") +: qs.map(q =>
      Rounding.duckRound(percentile(value, lit(q)), 6)
        .as(s"p${(q * 100).round}"))
    df.groupBy(key).agg(aggs.head, aggs.tail: _*)
  }

  /** The extreme-cardinality swap [[groupedQuantiles]] documents:
    * `percentile_approx` (Greenwald-Khanna sketch, accuracy 1/10000) is
    * MERGEABLE — partials combine map-side and per-group state is a
    * fixed-size sketch instead of a buffer of every value, so group
    * cardinality no longer bounds the operator. The sketch is
    * engine-specific (no DuckDB twin computes the same ranks), so the
    * approx form has no hash oracle — the driver records rows/schema
    * only, same class as e13. */
  def groupedQuantilesApprox(df: DataFrame, key: Column, value: Column,
      qs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.9, 0.99)): DataFrame = {
    val aggs = count(lit(1)).as("n") +: qs.map(q =>
      Rounding.duckRound(percentile_approx(value, lit(q), lit(10000)), 6)
        .as(s"p${(q * 100).round}"))
    df.groupBy(key).agg(aggs.head, aggs.tail: _*)
  }
}
