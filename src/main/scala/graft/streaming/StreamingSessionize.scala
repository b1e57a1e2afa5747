package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming form of sessionization (W6, the gap-based session split the
  * batch engine runs as a lag-window over `(user_id, ts)` order): Spark's
  * native `session_window` aggregate — per key, events whose gap to the
  * previous event is under `gap` merge into one growing window; a gap of
  * `gap` or more closes the session.
  *
  * Boundary semantics: a session window spans `[first event, last event
  * + gap]` for merge purposes — TOUCHING windows merge, so an event
  * landing exactly `gap` after the previous one JOINS the session
  * (diff <= gap merges, only diff > gap splits; spec-pinned in
  * StreamingSessionizeSpec). This is the same boundary as the batch W6
  * ordinal's `> gap` split rule, so a replayed stream converges to the
  * batch session split exactly.
  *
  * Scale shape: this is the session topology the 100 TB design wants —
  * shuffle on the user key, session merge inside the state store, state
  * bounded by OPEN sessions inside the watermark horizon (closed
  * sessions emit once in append mode and leave state). The batch w6
  * ordinal numbering needs total per-user order; the streaming form
  * never materializes an ordinal — sessions are identified by their
  * start time, which is stable under replay.
  */
object StreamingSessionize {

  /** Per-(user, session) aggregate over a streaming events frame:
    * (user_id, session_start, n_events, last_ts).
    * @param gap session gap, e.g. "30 minutes"
    * @param watermark max event-time lateness */
  def sessions(events: DataFrame, gap: String = "30 minutes",
               watermark: String = "2 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), max(col("ts")).as("last_ts"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("n_events"), col("last_ts"))
}
