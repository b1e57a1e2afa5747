package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming form of the J2 hybrid fusion — the reference's
  * signature `combine_first` (`hybrid_merger.py:202`, SURVEY §2.4 J2)
  * as a watermarked STREAM-STREAM FULL OUTER JOIN, Spark's third
  * streaming pillar (the 20 existing replay gates cover windowed
  * aggregation and per-key arbitrary state; none exercised the
  * symmetric hash join until this one).
  *
  * Semantics: both candle streams watermark their minute timestamp,
  * then full-outer equi-join ON the event-time column itself — the
  * canonical supported shape (the join key IS the watermarked column,
  * so the state watermark equals the event-time watermark and each
  * side's buffered rows are evictable the moment the global watermark
  * passes their minute). Per-column `coalesce` prefers the tick cell
  * and falls back to M1 exactly like the batch
  * [[graft.ops.FusionOps.combineFirst]]; matched minutes emit in the
  * micro-batch where the match arrives, unmatched minutes emit their
  * outer-null row when the watermark passes them. A bounded
  * `AvailableNow` replay therefore converges to the batch full outer
  * join PROVIDED the watermark delay exceeds the replay's maximum
  * disorder and a final flush row advances the watermark past
  * end-of-data (the harness's sentinel stage — without it the trailing
  * unmatched minutes would wait forever on a watermark that no longer
  * advances).
  *
  * Scale: this is the 100 TB live-fusion topology — a tick feed fused
  * against a slowly-arriving legacy M1 feed. State is bounded by
  * (watermark delay × candle rate) PER SIDE, not by history: candles,
  * never ticks, cross the exchange (the upstream resample already
  * collapsed tick volume), and the join shuffles both sides on the
  * minute key so a 1000-executor cluster partitions state by time
  * range. Late M1 rows inside the delay pair with the buffered tick
  * row; rows behind the watermark are dropped at the input filter —
  * the documented, bounded-state trade every production stream-stream
  * join makes (pinned in `StreamingFusionSpec`'s late-drop case).
  */
object StreamingFusion {

  /** Watermarked full-outer stream-stream equi-join on `datetime` +
    * per-column coalesce == batch `combineFirst`. Both inputs must be
    * streaming frames carrying an event-time `datetime` column; value
    * columns present on both sides coalesce tick-first, tick-only
    * columns pass through, m1-only columns fill the tick-absent
    * minutes.
    */
  /** @param extraKeys additional equi-join key columns beyond the
    *                   minute timestamp (the multi-symbol form: join
    *                   on (sym, datetime); Spark accepts a composite
    *                   stream-stream key as long as the watermarked
    *                   column is among the equalities). */
  def combineFirstStream(ticks: DataFrame, m1: DataFrame,
                         watermark: String,
                         extraKeys: Seq[String] = Nil): DataFrame = {
    val keyCols = "datetime" +: extraKeys
    val tCols = ticks.columns.filterNot(keyCols.contains).toSeq
    val mCols = m1.columns.filterNot(keyCols.contains).toSeq
    // watermark FIRST, then rename: the event-time tag lives in the
    // attribute metadata and survives the aliases
    val t = (tCols.map(c => c -> s"_t_$c") ++
      keyCols.map(k => k -> s"t_$k"))
      .foldLeft(ticks.withWatermark("datetime", watermark))(
        (d, r) => d.withColumnRenamed(r._1, r._2))
    val m = (mCols.map(c => c -> s"_m_$c") ++
      keyCols.map(k => k -> s"m_$k"))
      .foldLeft(m1.withWatermark("datetime", watermark))(
        (d, r) => d.withColumnRenamed(r._1, r._2))
    val cond = keyCols.map(k => col(s"t_$k") === col(s"m_$k"))
      .reduce(_ && _)
    val joined = t.join(m, cond, "full_outer")
    val mergedKeys = keyCols.map(k =>
      coalesce(col(s"t_$k"), col(s"m_$k")).as(k))
    val merged = tCols.map { c =>
      if (mCols.contains(c)) coalesce(col(s"_t_$c"), col(s"_m_$c")).as(c)
      else col(s"_t_$c").as(c)
    } ++ mCols.filterNot(tCols.contains).map(c => col(s"_m_$c").as(c))
    joined.select(mergedKeys ++ merged: _*)
  }
}
