package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming last-touch attribution — the stateful twin of the batch
  * window form (graft.ext.EventAnalytics.lastTouchAttribution): the
  * last marketing touch (view/click) per user rides in GroupState;
  * each purchase emits its attribution the moment it arrives, which
  * is the shape a real-time conversion ledger needs (the batch
  * ignore-nulls window is the same carry, just replayed).
  *
  * Convergence contract: the batch form's carried touch is a causal
  * per-key fold (last preceding touch in (ts, event_id) order), so
  * state = (touch id, type, µs) folded in that order reproduces the
  * batch answer row-for-row; the freshness test is the same
  * microsecond-integer comparison. The e138 oracle gates the replay
  * verbatim.
  *
  * Ordering contract: in-batch (ts, event_id) sort + monotone per-key
  * event time across micro-batches (the StreamingEwma contract).
  *
  * State is user-keyed: ~32 bytes per live key at 100 TB.
  */
object StreamingAttribution {

  case class EventIn(user_id: Long, event_id: Long, ts: Timestamp,
                     event_type: String)

  case class TouchOut(user_id: Long, event_id: Long, ts: Timestamp,
                      touch_type: String, touch_event_id: Option[Long])

  /** Last touch seen: id, type, event-time µs (None = no touch yet). */
  case class TouchState(id: Long, kind: String, us: Long)

  def attribute(events: Dataset[EventIn],
                windowDays: Int = 7): Dataset[TouchOut] = {
    implicit val outEnc = Encoders.product[TouchOut]
    implicit val keyEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.product[TouchState]
    val windowMicros = windowDays.toLong * 86400L * 1000000L
    def micros(t: Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout()) {
        (uid: Long, batch: Iterator[EventIn],
         state: GroupState[TouchState]) =>
          var touch = state.getOption
          val out = batch.toSeq
            .sortBy(e => (micros(e.ts), e.event_id))
            .flatMap { e =>
              val emitted =
                if (e.event_type == "purchase") {
                  val fresh = touch.filter(t =>
                    micros(e.ts) - t.us <= windowMicros)
                  Some(TouchOut(uid, e.event_id, e.ts,
                    fresh.map(_.kind).getOrElse("direct"),
                    fresh.map(_.id)))
                } else None
              if (e.event_type == "view" || e.event_type == "click")
                touch = Some(TouchState(e.event_id, e.event_type,
                  micros(e.ts)))
              emitted
            }
          touch.foreach(state.update)
          out.iterator
      }
  }
}
