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
    *                       collection for keys that go idle. A single
    *                       micro-batch straddling SEVERAL windows emits
    *                       one survivor per window (the copies are
    *                       folded window by window, not once per
    *                       batch). Requires a watermark on `ts`. None →
    *                       state never expires. */
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
            val out = ttlMs match {
              case None =>
                // single-pass fold to (survivor, count): earliest ts,
                // then lowest doc_id — the batch operator's min-doc_id
                // tie-break — in O(1) memory. A hot fingerprint with
                // millions of in-batch copies must not be materialized.
                var first: DocIn = null
                var n = 0L
                batch.foreach { d =>
                  n += 1
                  if (first == null || d.ts.getTime < first.ts.getTime ||
                    (d.ts.getTime == first.ts.getTime &&
                      d.doc_id < first.doc_id))
                    first = d
                }
                state.getOption match {
                  case Some(s) =>
                    state.update(s.copy(dropped = s.dropped + n))
                    Iterator.empty
                  case None =>
                    state.update(
                      SeenState(first.doc_id, first.ts.getTime, n - 1))
                    Iterator.single(DocOut(fp, first.doc_id, first.ts, 0L))
                }
              case Some(ttl) =>
                // PER-WINDOW fold: a batch may straddle several TTL
                // windows (each window = [first_ts, first_ts + ttl],
                // the next one opening at the first copy past the
                // horizon), and every window must emit its own
                // re-admitted survivor — suppressing a past-horizon
                // copy because an in-window copy shared its batch
                // would drop it forever. Copies are aggregated by
                // event time into (min doc_id, count) — memory is
                // O(distinct timestamps in the batch), so the hot-
                // fingerprint flood (millions of copies, few distinct
                // times) still folds to a handful of entries; the
                // worst case is a batch of all-distinct times, which
                // is bounded by batch span / time granularity.
                val byTs = new java.util.TreeMap[Long, (Long, Long)]()
                batch.foreach { d =>
                  val t = d.ts.getTime
                  val prev = byTs.get(t)
                  byTs.put(t,
                    if (prev == null) (d.doc_id, 1L)
                    else (math.min(prev._1, d.doc_id), prev._2 + 1L))
                }
                val emitted =
                  scala.collection.mutable.ListBuffer.empty[DocOut]
                var cur = state.getOption
                while (!byTs.isEmpty) {
                  cur match {
                    case Some(s) if byTs.firstKey() <= s.firstTsMs + ttl =>
                      // in-window copies: suppress and count
                      val inWin = byTs.headMap(s.firstTsMs + ttl, true)
                      var n = 0L
                      inWin.values().forEach(v => n += v._2)
                      inWin.clear()
                      cur = Some(s.copy(dropped = s.dropped + n))
                    case prev =>
                      // next copy is past the horizon (or no state):
                      // re-admit as the new window's first occurrence,
                      // surfacing the closed window's suppressed count
                      val e = byTs.pollFirstEntry()
                      val (minDoc, cnt) = e.getValue
                      emitted += DocOut(fp, minDoc,
                        new Timestamp(e.getKey),
                        prev.map(_.dropped).getOrElse(0L))
                      cur = Some(SeenState(minDoc, e.getKey, cnt - 1))
                  }
                }
                cur.foreach(state.update)
                emitted.iterator
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
