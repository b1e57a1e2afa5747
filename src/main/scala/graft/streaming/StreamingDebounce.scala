package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming keep-anchored debounce — the stateful stream form of
  * [[graft.ext.EventAnalytics.anchoredDebounce]]: emit an event iff at
  * least `gapSeconds` passed since the last EMITTED event of its key.
  * State is one long (the anchor micros) per key; the fold is the
  * IDENTICAL decision sequence as the batch operator (same in-batch
  * (ts, event_id) sort, same anchor advance), so a time-ordered replay
  * equals the batch answer exactly and the e110 oracle gates it
  * verbatim. Ordering contract as [[StreamingEwma]]: micro-batches
  * must partition event time monotonically per key. */
object StreamingDebounce {

  case class EventIn(user_id: Long, event_id: Long, ts: Timestamp,
                     value: Double)

  case class Anchor(micros: Long)

  private def micros(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  def debounce(events: Dataset[EventIn],
               gapSeconds: Long = 3600L): Dataset[EventIn] = {
    implicit val outEnc = Encoders.product[EventIn]
    implicit val keyEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.product[Anchor]
    val gapMicros = gapSeconds * 1000000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout()) {
        (_: Long, batch: Iterator[EventIn], state: GroupState[Anchor]) =>
          var anchor = state.getOption.map(_.micros)
            .getOrElse(Long.MinValue)
          val out = batch.toSeq
            .sortBy(e => (micros(e.ts), e.event_id))
            .filter { e =>
              val m = micros(e.ts)
              val keep = anchor == Long.MinValue ||
                m - anchor >= gapMicros
              if (keep) anchor = m
              keep
            }
          state.update(Anchor(anchor))
          out.iterator
      }
  }
}
