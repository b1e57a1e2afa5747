package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tick-stream preparation: filters F1/F2 and projections P6/P7 from
  * SURVEY.md §2 (`hybrid_merger.py:85-98`).
  *
  * All operators here are pure narrow transformations (filter + project) —
  * no shuffle, fully codegen'd, and the predicates sit directly above the
  * scan so Catalyst pushes them into the parquet/CSV reader. At 100 TB this
  * is the stage that must shrink the data before the first exchange.
  */
object TickPrep {

  /** F1: drop zero/garbage quotes — `ask < 0.0001 OR bid < 0.0001`
    * (`hybrid_merger.py:85-87`). */
  def badTickFilter(ticks: DataFrame): DataFrame =
    ticks.filter(!(col("ask") < 0.0001 || col("bid") < 0.0001))

  /** F2: FX market-closure filter — drop Saturday entirely, Friday from
    * 22:00 UTC, Sunday before 21:00 UTC (`hybrid_merger.py:89-93`).
    *
    * ⚠ numbering trap (SURVEY §2 P13): pandas `dayofweek` is Mon=0..Sun=6
    * (reference tests Sat=5, Fri=4, Sun=6); Spark `dayofweek` is
    * Sun=1..Sat=7, so Sat=7, Fri=6, Sun=1.
    */
  def weekendFilter(ticks: DataFrame, ts: String = "datetime"): DataFrame = {
    val dow = dayofweek(col(ts))
    val hr = hour(col(ts))
    ticks.filter(!(dow === 7 ||
      (dow === 6 && hr >= 22) ||
      (dow === 1 && hr < 21)))
  }

  /** P6+P7: derive mid price and spread from bid/ask
    * (`hybrid_merger.py:97-98`). */
  def deriveMidSpread(ticks: DataFrame): DataFrame =
    ticks
      .withColumn("mid", (col("ask") + col("bid")) / 2)
      .withColumn("spread", col("ask") - col("bid"))

  /** The full tick-prep stage in reference order: F1 → F2 → P6/P7. */
  def apply(ticks: DataFrame): DataFrame =
    deriveMidSpread(weekendFilter(badTickFilter(ticks)))
}
