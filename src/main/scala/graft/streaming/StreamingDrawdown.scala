package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-key running-peak drawdown — the stateful twin of the
  * batch operator (graft.ext.EventAnalytics.maxDrawdown): every event
  * emits its high-water mark, current drawdown, and worst drawdown so
  * far, with O(1) state per key (two doubles).
  *
  * Convergence contract: the batch form is three CAUSAL running window
  * aggregates — peak = running max(value), drawdown = round((peak −
  * value)/peak, 6), max_drawdown = running max(drawdown). Running max
  * is exact (no fp accumulation), the ratio is one identical
  * expression tree, and the running max of ROUNDED drawdowns is exact
  * again — so folding (peak, maxDd) per event in (ts, event_id) order
  * replays bit-identical to the batch window form (the e118 oracle
  * gates the replay verbatim). This is why maxDrawdown emits the
  * running max rather than a whole-partition max: the causal form is
  * the one a stream CAN emit without waiting for the key to end.
  *
  * Ordering contract: state folds events in arrival order after an
  * in-batch (ts, event_id) sort, so micro-batches must partition event
  * time monotonically per key (time-staged replay / ordered sources) —
  * the StreamingEwma contract; late events would need the
  * watermark-hold pattern of StreamingSessionize instead.
  *
  * State is user-keyed: shards across executors like any keyed stream;
  * at 100 TB the budget is (live keys) × 16 bytes.
  */
object StreamingDrawdown {

  case class EventIn(user_id: Long, event_id: Long, ts: Timestamp,
                     value: Double)

  case class DrawdownOut(user_id: Long, event_id: Long, ts: Timestamp,
                         value: Double, peak: Double, drawdown: Double,
                         max_drawdown: Double)

  /** (running peak, running max of rounded drawdowns). */
  case class DdState(peak: Double, maxDd: Double)

  def drawdown(events: Dataset[EventIn]): Dataset[DrawdownOut] = {
    implicit val outEnc = Encoders.product[DrawdownOut]
    implicit val keyEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.product[DdState]
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout()) {
        (uid: Long, batch: Iterator[EventIn],
         state: GroupState[DdState]) =>
          var st = state.getOption.getOrElse(
            DdState(Double.NegativeInfinity, Double.NegativeInfinity))
          val out = batch.toSeq
            .sortBy(e => (e.ts.getTime, e.event_id))
            .map { e =>
              val peak = math.max(st.peak, e.value)
              val dd = graft.Rounding.duckRoundDouble(
                (peak - e.value) / peak, 6)
              st = DdState(peak, math.max(st.maxDd, dd))
              DrawdownOut(uid, e.event_id, e.ts, e.value, peak, dd,
                st.maxDd)
            }
          state.update(st)
          out.iterator
      }
  }
}
