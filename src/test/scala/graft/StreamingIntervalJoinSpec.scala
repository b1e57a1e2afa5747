package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.{StagedReplay, StreamingIntervalJoin,
  StreamingOhlc}

/** The stream-stream INTERVAL join (j7): equality on the window key +
  * a canonical time band for the state bound + the variable window
  * end as a residual predicate.
  *
  * Pinned contracts:
  *  1. RESIDUAL SEMANTICS — an event INSIDE the canonical band
  *     [wstart, wstart + maxSpan] but AT/PAST the true wend must NOT
  *     match (the band admits it to state; the residual rejects the
  *     pair), and an event exactly AT wstart must match ([lo, hi)).
  *  2. SYMMETRIC BUFFERING — events staged before their window and
  *     windows staged before their events both pair: the inner join
  *     buffers whichever side arrives first and emits on the second
  *     arrival, in whichever order the stages deliver.
  */
class StreamingIntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def events(rows: (Long, String, Double)*): DataFrame =
    rows.toSeq.map { case (id, t, v) => (ts(t), id, v, 0L) }
      .toDF("ts", "event_id", "value", "dayord")

  private def windows(rows: (String, String)*): DataFrame =
    rows.toSeq.map { case (s, e) => (0L, ts(s), ts(e)) }
      .toDF("dayord", "wstart", "wend")

  private def replay(eStages: Seq[DataFrame], wStages: Seq[DataFrame],
                     dir: String): Seq[(Long, java.sql.Timestamp)] = {
    val eDir = StagedReplay.stageFiles(eStages, s"$dir/e")
    val wDir = StagedReplay.stageFiles(wStages, s"$dir/w")
    def stream(p: String, sch: org.apache.spark.sql.types.StructType) =
      spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1").parquet(p)
    StreamingOhlc.replayToBatchAppend(spark,
      StreamingIntervalJoin.eventsInWindows(
        stream(eDir, eStages.head.schema),
        stream(wDir, wStages.head.schema),
        delay = "2 days", maxSpan = "60 minutes"))
      .select(col("event_id"), col("wstart"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getTimestamp(1)))
      .sortBy(_._1)
  }

  test("residual predicate: inside the canonical band but past wend " +
    "does not match; exactly at wstart does; at wend does not") {
    val ev = events(
      (1L, "2024-01-01 10:00:00", 1.0), // == wstart → match
      (2L, "2024-01-01 10:20:00", 2.0), // inside [wstart, wend) → match
      (3L, "2024-01-01 10:30:00", 3.0), // == wend → residual rejects
      (4L, "2024-01-01 10:45:00", 4.0), // in band, past wend → rejects
      (5L, "2024-01-01 11:30:00", 5.0)) // past the band entirely
    val w = windows(("2024-01-01 10:00:00", "2024-01-01 10:30:00"))
    val got = replay(Seq(ev), Seq(w),
      "target/test-fixtures/ivj_residual")
    assert(got.map(_._1) == Seq(1L, 2L))
    assert(got.forall(_._2 == ts("2024-01-01 10:00:00")))
  }

  test("left outer: matched events pair, unmatched events flush " +
    "their null row once the sentinel advances the watermark") {
    val ev = events(
      (1L, "2024-01-01 10:05:00", 1.0), // inside → matched
      (2L, "2024-01-01 17:00:00", 2.0)) // no window → null row
    val sentinelEv = events((-1L, "2024-01-20 00:00:00", 0.0))
    val w = windows(("2024-01-01 10:00:00", "2024-01-01 10:30:00"))
    val sentinelW = Seq((-1L, ts("2024-01-20 00:00:00"),
      ts("2024-01-20 00:00:00"))).toDF("dayord", "wstart", "wend")
    val eDir = StagedReplay.stageFiles(Seq(ev, sentinelEv),
      "target/test-fixtures/ivj_left/e")
    val wDir = StagedReplay.stageFiles(Seq(w, sentinelW),
      "target/test-fixtures/ivj_left/w")
    def stream(p: String, sch: org.apache.spark.sql.types.StructType) =
      spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1").parquet(p)
    val got = StreamingOhlc.replayToBatchAppend(spark,
      graft.streaming.StreamingIntervalJoin.eventsInWindowsLeft(
        stream(eDir, ev.schema), stream(wDir, w.schema),
        delay = "2 days", maxSpan = "60 minutes"))
      .filter(col("event_id") >= 0)
      .select(col("event_id"), col("wstart"))
      .collect().toSeq
      .map(r => (r.getLong(0), Option(r.getTimestamp(1))))
      .sortBy(_._1)
    assert(got == Seq(
      (1L, Some(ts("2024-01-01 10:00:00"))),
      (2L, None)))
  }

  test("symmetric buffering: an event staged before its window and a " +
    "window staged before its event both pair") {
    // stage 1: event A (window arrives later) + window W2 (its event
    // arrives later); stage 2: the counterparts
    val evA = events((10L, "2024-01-01 08:10:00", 1.0))
    val evB = events((20L, "2024-01-01 12:10:00", 2.0))
    val w1 = windows(("2024-01-01 08:00:00", "2024-01-01 08:30:00"))
    val w2 = windows(("2024-01-01 12:00:00", "2024-01-01 12:30:00"))
    val got = replay(Seq(evA, evB), Seq(w2, w1),
      "target/test-fixtures/ivj_symmetric")
    assert(got.map(_._1) == Seq(10L, 20L))
    assert(got.map(_._2) == Seq(ts("2024-01-01 08:00:00"),
      ts("2024-01-01 12:00:00")))
  }
}
