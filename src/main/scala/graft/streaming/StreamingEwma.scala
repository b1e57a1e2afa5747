package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-key EWMA — the stateful-feature counterpart of the
  * batch smoother (graft.ext.EventAnalytics.ewma): every event emits
  * its up-to-date exponentially weighted mean, with O(1) state per key
  * (three doubles), across micro-batches.
  *
  * Convergence contract: the batch operator computes
  * y_i = Σ x_j·r^{−j} / Σ r^{−j} as two rank-ordered RUNNING sums.
  * This operator keeps exactly those running sums as state —
  * (j, num, den) — and folds each event in (ts, event_id) order with
  * the SAME adds and the same Math.pow weights, so a time-ordered
  * replay is bit-identical to the batch window form, not merely
  * numerically close (the e100 oracle gates the replay verbatim).
  * The textbook O(1) recurrence y_i = α·x_i + (1−α)·y_{i−1} is the
  * same mathematical object but a DIFFERENT fp summation order; using
  * it would converge only to rounding tolerance. The r^{−j} growth
  * bounds per-key history length exactly like the batch form
  * (document the segmented rescale for kilometre-long keys).
  *
  * Ordering contract: state folds events in arrival order after an
  * in-batch (ts, event_id) sort, so micro-batches must partition
  * event time monotonically per key (time-staged replay / ordered
  * sources). Late events would need the watermark-hold pattern of
  * StreamingSessionize instead — a different operator by design.
  *
  * State is user-keyed: shards across executors like any keyed
  * stream; at 100 TB the budget is (live keys) × 24 bytes.
  */
object StreamingEwma {

  case class EventIn(user_id: Long, event_id: Long, ts: Timestamp,
                     value: Double)

  case class EwmaOut(user_id: Long, event_id: Long, ts: Timestamp,
                     ewma_value: Double)

  /** (next index j, Σ x·r^{−j}, Σ r^{−j}) — the batch running sums. */
  case class EwmaState(j: Long, num: Double, den: Double)

  def ewma(events: Dataset[EventIn],
           alpha: Double = 0.1): Dataset[EwmaOut] = {
    implicit val outEnc = Encoders.product[EwmaOut]
    implicit val keyEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.product[EwmaState]
    val base = 1.0 / (1.0 - alpha)
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout()) {
        (uid: Long, batch: Iterator[EventIn],
         state: GroupState[EwmaState]) =>
          var st = state.getOption.getOrElse(EwmaState(0L, 0.0, 0.0))
          val out = batch.toSeq
            .sortBy(e => (e.ts.getTime, e.event_id))
            .map { e =>
              val w = math.pow(base, st.j.toDouble)
              st = EwmaState(st.j + 1, st.num + e.value * w,
                st.den + w)
              EwmaOut(uid, e.event_id, e.ts,
                graft.Rounding.duckRoundDouble(st.num / st.den, 6))
            }
          state.update(st)
          out.iterator
      }
  }
}
