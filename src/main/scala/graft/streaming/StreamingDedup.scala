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

  case class DocOut(fp: String, doc_id: Long, ts: Timestamp,
                    n_dropped_before: Long)

  /** Seen-state: first-seen doc and how many later copies were dropped
    * (emitted with the survivor for observability — mirrors the batch
    * operator's n_copies). */
  case class SeenState(firstDocId: Long, firstTsMs: Long, dropped: Long)

  /** @param idleTtlMinutes event-time TTL per fingerprint, measured from
    *                       the FIRST occurrence and NOT refreshed by
    *                       suppressed copies (fixed-window dedup — the
    *                       same contract as `dropDuplicates` within a
    *                       watermark horizon; a key can expire in the
    *                       same batch a fresh copy arrives, which is
    *                       then re-admitted as a new first occurrence).
    *                       Requires a watermark on `ts`. None → state
    *                       never expires. */
  def dedup(docs: Dataset[DocIn],
            idleTtlMinutes: Option[Long] = None): Dataset[DocOut] = {
    implicit val outEnc = Encoders.product[DocOut]
    implicit val keyEnc = Encoders.STRING
    implicit val stateEnc = Encoders.product[SeenState]
    val timeoutConf =
      if (idleTtlMinutes.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    docs.groupByKey(_.fp)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
        (fp: String, batch: Iterator[DocIn], state: GroupState[SeenState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // first occurrence within the batch: deterministic order
            // (earliest ts, then lowest doc_id), matching the batch
            // operator's min-doc_id survivor pick on ties
            val rows = batch.toSeq.sortBy(d => (d.ts.getTime, d.doc_id))
            val out = state.getOption match {
              case Some(s) =>
                state.update(s.copy(dropped = s.dropped + rows.size))
                Iterator.empty
              case None =>
                val first = rows.head
                state.update(SeenState(first.doc_id, first.ts.getTime,
                  rows.size - 1))
                Iterator.single(DocOut(fp, first.doc_id, first.ts, 0L))
            }
            idleTtlMinutes.foreach { ttl =>
              val s = state.get
              // clamp beyond the current watermark (see
              // StreamingGapBridge.bridge for the backfill rationale)
              state.setTimeoutTimestamp(
                math.max(s.firstTsMs + ttl * 60000L,
                  state.getCurrentWatermarkMs() + 60000L))
            }
            out
          }
      }
  }
}
