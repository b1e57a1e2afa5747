package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming two-sided CUSUM — the stateful twin of the batch fold
  * (graft.ext.EventAnalytics.cusum): every event emits its updated
  * drift statistics and alarm flag, with O(1) state per key (two
  * doubles).
  *
  * Convergence contract: the batch operator is already a sequential
  * per-key fold (flatMapGroups) — s⁺ₜ = max(0, s⁺ₜ₋₁ + devₜ − slack),
  * s⁻ₜ = max(0, s⁻ₜ₋₁ − devₜ − slack) — so carrying (s⁺, s⁻) as
  * GroupState and folding each event in (ts, event_id) order with the
  * SAME double arithmetic makes a time-ordered replay bit-identical
  * to the batch form (the e135 oracle gates the replay verbatim).
  * The reference mean is a TRAINED parameter passed in (computed on
  * the reference window batch-side, rounded before use) — exactly how
  * a deployed monitor works: the baseline is fixed at deploy time,
  * not re-estimated per micro-batch.
  *
  * Ordering contract: in-batch (ts, event_id) sort + monotone
  * per-key event time across micro-batches (the StreamingEwma
  * contract); late events would need the watermark-hold pattern.
  *
  * State is user-keyed: (live keys) × 16 bytes at 100 TB.
  */
object StreamingCusum {

  case class EventIn(user_id: Long, event_id: Long, ts: Timestamp,
                     value: Double)

  case class CusumOut(user_id: Long, event_id: Long, ts: Timestamp,
                      s_pos: Double, s_neg: Double, alarm: Boolean)

  /** (s⁺, s⁻) — the two one-sided drift accumulators, unrounded. */
  case class CusumState(sp: Double, sn: Double)

  def cusum(events: Dataset[EventIn], meanS: Double,
            slack: Double = 0.05, h: Double = 1.0)
      : Dataset[CusumOut] = {
    implicit val outEnc = Encoders.product[CusumOut]
    implicit val keyEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.product[CusumState]
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout()) {
        (uid: Long, batch: Iterator[EventIn],
         state: GroupState[CusumState]) =>
          var st = state.getOption.getOrElse(CusumState(0.0, 0.0))
          val out = batch.toSeq
            .sortBy(e => (e.ts.getTime, e.event_id))
            .map { e =>
              val dev = e.value / 100.0 - meanS
              val sp = math.max(0.0, st.sp + dev - slack)
              val sn = math.max(0.0, st.sn - dev - slack)
              st = CusumState(sp, sn)
              CusumOut(uid, e.event_id, e.ts,
                graft.Rounding.duckRoundDouble(sp, 6),
                graft.Rounding.duckRoundDouble(sn, 6),
                sp > h || sn > h)
            }
          state.update(st)
          out.iterator
      }
  }
}
