package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of the "Immutable Time Grid" (U2/W4,
  * `hybrid_merger.py:215-239`): per key, every minute between two
  * observed candles is emitted as a synthetic flat candle inheriting the
  * last real close/spread — the stateful operator SURVEY §2.12 flags as
  * the genuinely hard streaming piece.
  *
  * Topology: keyed state via `flatMapGroupsWithState` — state is one
  * (lastMinute, lastClose, lastSpread) record per key, independent of
  * tick volume. Candles arrive from the watermarked [[StreamingOhlc]]
  * aggregate in append mode, i.e. once their window closes; within a
  * micro-batch they are processed in minute order. Late candles older
  * than already-bridged minutes are dropped (the immutable grid: history
  * is never rewritten — same contract as the batch pipeline, which drops
  * data arriving after a gap was bridged).
  */
object StreamingGapBridge {

  case class CandleIn(key: String, datetime: Timestamp, open: Double,
                      high: Double, low: Double, close: Double,
                      volume: Long, spread: Double)

  case class CandleOut(key: String, datetime: Timestamp, open: Double,
                       high: Double, low: Double, close: Double,
                       volume: Long, spread: Double, is_flat: Int)

  case class BridgeState(lastMinute: Long, lastClose: Double,
                         lastSpread: Double)

  private val MinuteMs = 60000L

  /** @param idleTtlMinutes event-time TTL after which a quiescent key's
    *                 state is dropped — bounds state by ACTIVE keys, not
    *                 all keys ever seen (delisted symbols, churned
    *                 users). Requires a watermark on the input stream
    *                 (event-time timeouts fire as the watermark passes).
    *                 A key resuming after expiry restarts its grid
    *                 rather than bridging across the idle span. None →
    *                 no expiry (only for bounded key domains). */
  def bridge(candles: Dataset[CandleIn],
             idleTtlMinutes: Option[Long] = None): Dataset[CandleOut] = {
    implicit val outEnc = Encoders.product[CandleOut]
    implicit val keyEnc = Encoders.STRING
    implicit val stateEnc = Encoders.product[BridgeState]
    val timeoutConf =
      if (idleTtlMinutes.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    candles.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
        (key: String, batch: Iterator[CandleIn],
         state: GroupState[BridgeState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val out = scala.collection.mutable.ListBuffer.empty[CandleOut]
            var st = state.getOption
            batch.toSeq.sortBy(_.datetime.getTime).foreach { c =>
              val minute = c.datetime.getTime / MinuteMs
              st match {
                case Some(s) if minute <= s.lastMinute =>
                // late arrival behind the bridged frontier: grid immutable
                case cur =>
                  cur.foreach { s =>
                    ((s.lastMinute + 1) until minute).foreach { g =>
                      out += CandleOut(key, new Timestamp(g * MinuteMs),
                        s.lastClose, s.lastClose, s.lastClose, s.lastClose,
                        0L, s.lastSpread, is_flat = 1)
                    }
                  }
                  out += CandleOut(key, c.datetime, c.open, c.high, c.low,
                    c.close, c.volume, c.spread, is_flat = 0)
                  st = Some(BridgeState(minute, c.close, c.spread))
              }
            }
            st.foreach { s =>
              state.update(s)
              // Clamp the event-time timeout to strictly beyond the
              // current watermark: during a backfill, a key whose latest
              // candle lags the global watermark by more than the TTL
              // would otherwise get a timeout in the "past", which Spark
              // rejects with IllegalArgumentException — killing the whole
              // query. Clamped, the far-behind key simply expires on the
              // next watermark advance.
              idleTtlMinutes.foreach(ttl => state.setTimeoutTimestamp(
                math.max((s.lastMinute + ttl) * MinuteMs,
                  state.getCurrentWatermarkMs() + MinuteMs)))
            }
            out.iterator
          }
      }
  }
}
