package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming form of the dataset profile (graft.ext.DataProfile): the
  * per-window data-quality monitor an ingestion pipeline keeps running —
  * null rates, value ranges, row counts per event-time window — so a
  * upstream schema break or drift shows up within one watermark delay
  * instead of at the next batch profile.
  *
  * Same design rules as the batch profile: every statistic is an
  * aggregate with a map-side partial, keyed by the tumbling window (plus
  * optional keys), so state is one row per (window, key) and the shuffle
  * carries partials, never rows. `approx_count_distinct` stands in for
  * the batch profile's exact distinct — the mergeable sketch is the only
  * form a stream can maintain incrementally.
  */
object StreamingProfile {

  /** Windowed profile of a numeric `value` column plus null/row counts.
    * @param rows streaming frame with an event-time column `ts`
    * @param watermark max event-time lateness, e.g. "2 minutes"
    */
  def windowed(rows: DataFrame, valueCol: String,
               windowLen: String = "1 minute",
               watermark: String = "2 minutes",
               keyCols: Seq[String] = Nil): DataFrame = {
    val v: Column = col(valueCol)
    val keys = keyCols.map(col) :+ window(col("ts"), windowLen)
    rows
      .withWatermark("ts", watermark)
      .groupBy(keys: _*)
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(v.isNull, 1L).otherwise(0L)).as(s"${valueCol}_nulls"),
        min(v).as(s"${valueCol}_min"),
        max(v).as(s"${valueCol}_max"),
        avg(v).as(s"${valueCol}_avg"),
        approx_count_distinct(v).as(s"${valueCol}_approx_distinct"))
      .select((keyCols.map(col) :+ col("window.start").as("window_start")) ++
        Seq(col("n_rows"), col(s"${valueCol}_nulls"),
          col(s"${valueCol}_min"), col(s"${valueCol}_max"),
          col(s"${valueCol}_avg"),
          col(s"${valueCol}_approx_distinct")): _*)
  }
}
