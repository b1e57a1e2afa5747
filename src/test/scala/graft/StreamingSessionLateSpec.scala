package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.{StagedReplay, StreamingOhlc, StreamingSessionize}

/** Late/out-of-order data through the SESSION-window aggregate — the
  * session analog of StreamingLateDataSpec's tumbling-window contract.
  * Same two-watermark machinery (SPARK-40925): in micro-batch N the
  * late filter uses batch N-1's eviction watermark (one batch of lag),
  * eviction emits sessions whose window END (last event + gap) clears
  * the current watermark. What is SESSION-specific and worth pinning:
  *
  *  - a late event landing within `gap` of a still-open session MERGES
  *    into it (extends the window, bumps the count);
  *  - a late event gap-adjacent to an open session but BEHIND the
  *    lagged watermark (its own single-event window end <= that
  *    watermark) is dropped — the session does NOT absorb it;
  *  - a session already evicted never reopens; dropped late events
  *    cannot resurrect it.
  */
class StreamingSessionLateSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String)*): DataFrame =
    rows.toSeq.map { case (u, t) => (u, ts(t)) }.toDF("user_id", "ts")

  test("late events merge into open sessions; behind-watermark late " +
    "events drop and closed sessions stay closed") {
    // gap 10 min, watermark 5 min
    // stage 1: u1 session A at 10:00/10:02; u1 event at 10:40 (new
    //          session B); max ET 10:40 -> eviction wm 10:35 from
    //          stage 2 on (session A ends 10:12 <= 10:35: evicted at
    //          stage 2's close, emitted with 2 events)
    val s1 = ev((1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 10:02:00"),
      (1L, "2024-01-01 10:40:00"))
    // stage 2: innocuous second user; its close makes 10:35 the LATE
    //          filter for stage 3
    val s2 = ev((2L, "2024-01-01 10:39:00"))
    // stage 3 (late, filter = 10:35):
    //  - (1, 10:05): single-event window end 10:15 <= 10:35 -> DROPPED
    //    (session A already emitted; must NOT grow or re-emit)
    //  - (1, 10:45): window end 10:55 > 10:35 -> MERGES into open
    //    session B (10:40 .. 10:45)
    val s3 = ev((1L, "2024-01-01 10:05:00"), (1L, "2024-01-01 10:45:00"))
    // stage 4: advance the watermark far enough to flush everything
    //          still open (max ET 11:30 -> final wm 11:25)
    val s4 = ev((2L, "2024-01-01 11:30:00"))
    val dir = StagedReplay.stageFiles(Seq(s1, s2, s3, s4),
      "target/test-fixtures/session_late_replay")
    val stream = spark.readStream
      .schema(s1.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val out = StreamingOhlc.replayToBatchAppend(spark,
      StreamingSessionize.sessions(stream, gap = "10 minutes",
        watermark = "5 minutes"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getLong(2), r.getTimestamp(3).toString))
      .toSet
    assert(out == Set(
      // session A: both stage-1 events, NOT the dropped 10:05 late one
      (1L, "2024-01-01 10:00:00.0", 2L, "2024-01-01 10:02:00.0"),
      // session B: stage-1 10:40 + MERGED late 10:45
      (1L, "2024-01-01 10:40:00.0", 2L, "2024-01-01 10:45:00.0"),
      // u2's singleton closes under the final watermark
      (2L, "2024-01-01 10:39:00.0", 1L, "2024-01-01 10:39:00.0")
      // u2's 11:30 singleton (end 11:40 > final wm 11:25): held back
    ), s"got: ${out.toSeq.sorted.mkString("\n")}")
  }
}
