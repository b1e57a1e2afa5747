package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ops.Resample

/** Structured-Streaming form of the candle resampler (SURVEY §2.12):
  * the reference's batch `resample('1min')` (G1–G3) becomes a watermarked
  * tumbling window over the tick stream.
  *
  * Semantics: identical bucket boundaries to the batch `date_trunc`
  * (tumbling `window($"datetime", "1 minute")` starts are minute floors);
  * open/close use the same ordered-min/max-of-struct trick, so a replayed
  * stream converges to exactly the batch result. The watermark bounds
  * state: ticks later than `watermark` behind the max event time are
  * dropped, and closed windows emit once in append mode.
  *
  * Scale: this is the streaming topology the 100 TB design wants —
  * shuffle on (key, window), partial aggregation before the exchange,
  * state store per window key. Flat-candle gap bridging (U2) would need
  * `transformWithState` timers to emit synthetic candles on event-time
  * progress; documented follow-on (SURVEY §2.12), not required for batch
  * parity.
  */
object StreamingOhlc {

  /** @param ticks streaming frame: datetime, tick_id, mid, spread
    * @param watermark max event-time lateness, e.g. "2 minutes"
    */
  def ohlc1min(ticks: DataFrame, watermark: String = "2 minutes",
               keyCols: Seq[String] = Nil): DataFrame = {
    val keys = keyCols.map(col) :+ window(col("datetime"), "1 minute")
    ticks
      .withWatermark("datetime", watermark)
      .groupBy(keys: _*)
      .agg(
        Resample.firstBy(col("mid"), col("datetime"), col("tick_id"))
          .as("open"),
        max(col("mid")).as("high"),
        min(col("mid")).as("low"),
        Resample.lastBy(col("mid"), col("datetime"), col("tick_id"))
          .as("close"),
        count(col("mid")).as("volume"),
        avg(col("spread")).as("spread"))
      .select((keyCols.map(col) :+ col("window.start").as("datetime")) ++
        Seq(col("open"), col("high"), col("low"), col("close"),
          col("volume"), col("spread")): _*)
  }

  private val replaySeq = new AtomicInteger(0)

  /** Replay a BOUNDED streaming plan to completion and return the
    * converged result as a batch DataFrame: `Trigger.AvailableNow`
    * processes every available input file and terminates; `complete`
    * output mode re-emits all windows each trigger, so the final
    * in-memory table equals the batch aggregation over the whole input
    * — including the trailing windows an append-mode sink would hold
    * back waiting for a watermark that never advances past end-of-data.
    *
    * This is the batch/stream parity harness: the driver's
    * `g1_streaming_replay` query pushes the sf parquet ticks through
    * [[ohlc1min]] here and hash-compares against the BATCH resample
    * oracle. Complete mode keeps all windows in the state store, which
    * is exactly right for a bounded replay (state = output cardinality,
    * candle-bounded); the unbounded production topology stays append
    * mode + watermark as documented above.
    */
  def replayToBatch(spark: SparkSession, streamingResult: DataFrame): DataFrame = {
    val name = s"graft_replay_${replaySeq.incrementAndGet()}"
    val q = streamingResult.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** [[replayToBatchAppend]] with the state-store partition count
    * pinned for the query's lifetime: a streaming query snapshots
    * `spark.sql.shuffle.partitions` at its FIRST batch and keeps one
    * state-store instance per partition per stateful operator side —
    * for a bounded replay whose state is candle-sized, 32 instances
    * are pure per-batch floor, so the join replays pin a smaller
    * count (the production query would size this to its key volume).
    * The session value is restored afterwards. */
  def replayWithStatePartitions(spark: SparkSession,
                                streamingResult: DataFrame,
                                partitions: Int): DataFrame = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, partitions.toString)
    try replayToBatchAppend(spark, streamingResult)
    finally spark.conf.set(key, prev)
  }

  /** [[replayToBatch]] for APPEND-mode streaming plans —
    * `flatMapGroupsWithState(Append, …)` operators (StreamingDedup,
    * StreamingGapBridge) reject complete mode, and unlike a windowed
    * aggregation they emit rows as they process, not on watermark
    * advance, so an `AvailableNow` replay's appended union IS the full
    * converged result (nothing is held back at end-of-data). */
  def replayToBatchAppend(spark: SparkSession,
                          streamingResult: DataFrame): DataFrame = {
    val name = s"graft_replay_${replaySeq.incrementAndGet()}"
    val q = streamingResult.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
