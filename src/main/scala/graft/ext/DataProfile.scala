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

  def profile(df: DataFrame): DataFrame = {
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
          countDistinct(c).as(s"${f.name}_distinct"))
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
}
