package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact deduplication — the ingestion-door counterpart of the
  * batch fingerprint dedup (graft.ext.Dedup.exact): on a live document
  * stream, emit only the FIRST occurrence of each content fingerprint
  * and drop every later copy, across micro-batches.
  *
  * Why not `dropDuplicates` on the stream: Spark's built-in streaming
  * dedup keeps state forever without a watermark column in the key, and
  * with one it dedups only within the watermark horizon. This operator
  * makes the trade-off explicit and configurable — keyed
  * `flatMapGroupsWithState` on the fingerprint, state = one record per
  * DISTINCT fingerprint (the first-seen doc id), optionally expired by
  * an event-time TTL so state is bounded by the distinct-content volume
  * inside the horizon, not all of history. With TTL, a copy arriving
  * after its original expired is re-emitted (exactly the watermark
  * contract of the built-in; None keeps state forever for bounded
  * corpora).
  *
  * State is fingerprint-keyed, so it shards across executors like any
  * keyed stream; per-key state is O(1) — at 100 TB the bound is
  * (distinct fingerprints in horizon) × ~32 bytes, the standard
  * streaming-dedup budget.
  */
object StreamingDedup {

  case class DocIn(fp: String, doc_id: Long, ts: Timestamp)

  /** `n_dropped_before`: copies of this fingerprint suppressed by the
    * PREVIOUS incarnation of the key, surfaced on the re-admitted
    * survivor after a TTL rollover (0 on a true first occurrence). A
    * key whose state is garbage-collected by the idle timeout without
    * ever being re-admitted takes its count with it — Append mode has
    * no row to carry it on. */
  case class DocOut(fp: String, doc_id: Long, ts: Timestamp,
                    n_dropped_before: Long)

  /** Seen-state: first-seen doc and how many later copies were dropped
    * (surfaced via DocOut.n_dropped_before at the next TTL rollover —
    * mirrors the batch operator's n_copies). */
  case class SeenState(firstDocId: Long, firstTsMs: Long, dropped: Long)

  /** @param idleTtlMinutes event-time TTL per fingerprint, measured from
    *                       the FIRST occurrence and NOT refreshed by
    *                       suppressed copies (fixed-window dedup — the
    *                       same contract as `dropDuplicates` within a
    *                       watermark horizon). Expiry is enforced in the
    *                       DATA PATH: a copy whose event time lands past
    *                       `first_ts + ttl` is re-admitted as a new
    *                       first occurrence immediately, even on a key
    *                       receiving a steady duplicate stream — the
    *                       clock timeout below is only garbage
    *                       collection for keys that go idle. Requires a
    *                       watermark on `ts`. None → state never
    *                       expires. */
  def dedup(docs: Dataset[DocIn],
            idleTtlMinutes: Option[Long] = None): Dataset[DocOut] = {
    implicit val outEnc = Encoders.product[DocOut]
    implicit val keyEnc = Encoders.STRING
    implicit val stateEnc = Encoders.product[SeenState]
    val timeoutConf =
      if (idleTtlMinutes.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val ttlMs = idleTtlMinutes.map(_ * 60000L)
    docs.groupByKey(_.fp)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
        (fp: String, batch: Iterator[DocIn], state: GroupState[SeenState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // single-pass fold to (survivor, count): earliest ts, then
            // lowest doc_id — the batch operator's min-doc_id tie-break
            // — in O(1) memory. A hot fingerprint with millions of
            // in-batch copies must not be materialized as a Seq.
            var first: DocIn = null
            var n = 0L
            batch.foreach { d =>
              n += 1
              if (first == null || d.ts.getTime < first.ts.getTime ||
                (d.ts.getTime == first.ts.getTime && d.doc_id < first.doc_id))
                first = d
            }
            val out = state.getOption match {
              // data-path TTL rollover: the batch's earliest copy lands
              // past the fixed window → new first occurrence, carrying
              // the count the previous incarnation suppressed
              case Some(s) if ttlMs.exists(t => first.ts.getTime > s.firstTsMs + t) =>
                state.update(SeenState(first.doc_id, first.ts.getTime, n - 1))
                Iterator.single(DocOut(fp, first.doc_id, first.ts, s.dropped))
              case Some(s) =>
                state.update(s.copy(dropped = s.dropped + n))
                Iterator.empty
              case None =>
                state.update(SeenState(first.doc_id, first.ts.getTime, n - 1))
                Iterator.single(DocOut(fp, first.doc_id, first.ts, 0L))
            }
            ttlMs.foreach { ttl =>
              val s = state.get
              // GC timestamp, clamped beyond the current watermark as
              // Spark requires (see StreamingGapBridge.bridge). Under a
              // steady duplicate stream this keeps sliding forward —
              // harmless, because window expiry is decided in the data
              // path above, not by this timer.
              state.setTimeoutTimestamp(
                math.max(s.firstTsMs + ttl,
                  state.getCurrentWatermarkMs() + 60000L))
            }
            out
          }
      }
  }
}
