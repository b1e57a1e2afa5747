package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of the ordered funnel (E39): per user, the first
  * `view`, the first `click` at-or-after that view, the first `purchase`
  * at-or-after that click — maintained incrementally in keyed state.
  *
  * Semantics per micro-batch: the chain refines monotonically —
  *   1. the first-view timestamp is the min over state and the batch's
  *      views (it only ever moves EARLIER, which can only widen the
  *      valid-click set, so the stored click stays valid);
  *   2. the first-click is the min over the stored click and batch
  *      clicks at-or-after the (new) first view;
  *   3. the first-purchase is the min over the stored purchase and
  *      batch purchases at-or-after the (new) first click.
  * Within one micro-batch this is exactly the batch operator's
  * semantics (`EventAnalytics.funnel`), so a single-batch
  * `Trigger.AvailableNow` replay converges to the batch result — the
  * e39_streaming_funnel_replay gate. Across batches the chain is exact
  * for in-event-time-order arrival; a click arriving in an EARLIER
  * batch than the view it should follow is only recovered if it
  * re-qualifies later (the same in-order caveat the sessionizer's
  * watermark states).
  *
  * Scale shape: state is three timestamps per user — O(users), not
  * O(events); each batch shuffles once on user_id into the state store.
  * Append mode emits each user's refined chain once per batch it
  * appears in.
  */
object StreamingFunnel {

  case class EvIn(user_id: Long, ts: Timestamp, event_type: String)
  case class FunnelState(view: Timestamp, click: Timestamp,
                         purchase: Timestamp, // nulls = step unreached
                         seq: Long) // emissions so far for this user
  /** `emit_seq` is a per-user emission ordinal (1, 2, …): append mode
    * emits one refined chain per batch the user appears in, so a
    * multi-batch replay holds several rows per user — the LATEST
    * (max emit_seq) is the current chain. Consumers dedup with
    * `max(struct(emit_seq, …))` per user; see the
    * e39_streaming_funnel_replay gate. */
  case class FunnelOut(user_id: Long, view_ts: Timestamp,
                       click_ts: Timestamp, purchase_ts: Timestamp,
                       emit_seq: Long)

  private def minTs(a: Timestamp, b: Timestamp): Timestamp =
    if (a == null) b else if (b == null) a
    else if (a.compareTo(b) <= 0) a else b

  def funnel(events: Dataset[EvIn]): Dataset[FunnelOut] = {
    implicit val outEnc = Encoders.product[FunnelOut]
    implicit val keyEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.product[FunnelState]
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout()) {
        (uid: Long, batch: Iterator[EvIn],
         state: GroupState[FunnelState]) =>
          val st = state.getOption.getOrElse(
            FunnelState(null, null, null, 0L))
          // one pass over the batch: bucket the three step types
          var bView: Timestamp = null
          val clicks = scala.collection.mutable.ArrayBuffer[Timestamp]()
          val purchases =
            scala.collection.mutable.ArrayBuffer[Timestamp]()
          batch.foreach { e =>
            e.event_type match {
              case "view"     => bView = minTs(bView, e.ts)
              case "click"    => clicks += e.ts
              case "purchase" => purchases += e.ts
              case _          => ()
            }
          }
          val view = minTs(st.view, bView)
          if (view == null) Iterator.empty // no view yet: no chain
          else {
            val click = clicks.filter(_.compareTo(view) >= 0)
              .foldLeft(st.click)(minTs)
            val purchase =
              if (click == null) null
              else purchases.filter(_.compareTo(click) >= 0)
                .foldLeft(st.purchase)(minTs)
            val seq = st.seq + 1
            state.update(FunnelState(view, click, purchase, seq))
            Iterator.single(FunnelOut(uid, view, click, purchase, seq))
          }
      }
  }
}
