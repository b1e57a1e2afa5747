package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.{StagedReplay, StreamingOhlc}

/** Late/out-of-order data through the streaming resampler (VERDICT r6
  * #3): staged multi-batch replays pinning the exact append-mode
  * contract the g10 oracle encodes. Spark's stateful operators carry
  * TWO watermarks (the SPARK-40925 split): in micro-batch N,
  *
  *  - the LATE-EVENT filter uses the watermark batch N-1 evicted with
  *    (one batch of lag) — a row is dropped iff its window end <= that
  *    lagged watermark;
  *  - EVICTION/emission at batch end uses the watermark computed from
  *    data through batch N-1 — a window is emitted once
  *    window end <= watermark, INCLUSIVE on equality;
  *  - windows whose end exceeds the final watermark are never emitted
  *    (AvailableNow runs a trailing no-data batch, so the last file's
  *    watermark advance does flush).
  *
  * Consequence worth spelling out: a row arriving ONE batch after the
  * data that advanced the watermark still merges into any un-evicted
  * window (the lagged filter admits it); the drop only engages from
  * the SECOND subsequent batch on. The 4-stage fixture below exercises
  * both sides.
  */
class StreamingLateDataSpec extends SparkSpec {
  import spark.implicits._

  private def ticks(rows: (String, Long, Double)*): DataFrame =
    rows.toSeq.map { case (t, id, m) => (ts(t), id, m, 0.5) }
      .toDF("datetime", "tick_id", "mid", "spread")

  private def replay(stages: Seq[DataFrame],
                     dir: String): Set[(String, Double, Long)] = {
    val d = StagedReplay.stageFiles(stages, dir)
    val stream = spark.readStream
      .schema(stages.head.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(d)
    StreamingOhlc.replayToBatchAppend(spark,
      StreamingOhlc.ohlc1min(stream, watermark = "2 minutes"))
      .select(col("datetime"), col("open"), col("volume"))
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getDouble(1),
        r.getLong(2)))
      .toSet
  }

  test("one-batch-lagged late filter: rows arriving the NEXT batch " +
    "merge into un-evicted windows; trailing window holds back") {
    // stage 1: max ET 10:05:10 -> eviction watermark 10:03:10 in
    // stage 2, but stage 2's LATE filter still sees the initial 0
    val s1 = ticks(
      ("2024-01-01 10:00:10", 1L, 1.0),
      ("2024-01-01 10:01:10", 2L, 2.0),
      ("2024-01-01 10:05:10", 3L, 3.0))
    val s2 = ticks(
      ("2024-01-01 10:00:30", 4L, 4.0), // end 10:01 <= 10:03:10, but
                                        // lagged filter = 0: MERGES
      ("2024-01-01 10:03:05", 5L, 5.0),
      ("2024-01-01 10:04:30", 6L, 6.0))
    val s3 = ticks(
      ("2024-01-01 10:06:10", 8L, 8.0), // end 10:07 == final wm: tie
                                        // is INCLUSIVE, emitted
      ("2024-01-01 10:09:00", 7L, 7.0)) // end 10:10 > wm: held back
    val out = replay(Seq(s1, s2, s3),
      "target/test-fixtures/late_replay_lag")
    assert(out == Set(
      ("2024-01-01 10:00:00.0", 1.0, 2L), // tick 4 merged (lag)
      ("2024-01-01 10:01:00.0", 2.0, 1L),
      ("2024-01-01 10:03:00.0", 5.0, 1L),
      ("2024-01-01 10:04:00.0", 6.0, 1L),
      ("2024-01-01 10:05:00.0", 3.0, 1L),
      ("2024-01-01 10:06:00.0", 8.0, 1L)
    ), s"got: ${out.toSeq.sorted.mkString("\n")}")
  }

  test("two batches on: behind-watermark rows DROP; open-window late " +
    "rows still merge") {
    val s1 = ticks(
      ("2024-01-01 10:00:10", 1L, 1.0),
      ("2024-01-01 10:01:10", 2L, 2.0),
      ("2024-01-01 10:05:10", 3L, 3.0)) // wm -> 10:03:10
    // stage 2: innocuous; its completion makes 10:03:10 the LATE
    // filter for stage 3 (and evicts windows ending <= 10:03:10)
    val s2 = ticks(
      ("2024-01-01 10:04:40", 9L, 9.0))
    val s3 = ticks(
      ("2024-01-01 10:00:30", 4L, 4.0), // end 10:01 <= 10:03:10: DROP
      ("2024-01-01 10:02:30", 5L, 5.0), // end 10:03 <= 10:03:10: DROP
      ("2024-01-01 10:03:30", 6L, 6.0), // end 10:04 > 10:03:10: MERGE
      ("2024-01-01 10:04:30", 10L, 10.0)) // open window: MERGE
    val s4 = ticks(
      ("2024-01-01 10:09:00", 7L, 7.0)) // advances wm to 10:07:00
    val out = replay(Seq(s1, s2, s3, s4),
      "target/test-fixtures/late_replay_drop")
    assert(out == Set(
      ("2024-01-01 10:00:00.0", 1.0, 1L), // tick 4 dropped
      ("2024-01-01 10:01:00.0", 2.0, 1L), // tick 5's window already
                                          // emitted without it
      ("2024-01-01 10:03:00.0", 6.0, 1L), // late-but-open: merged
      ("2024-01-01 10:04:00.0", 10.0, 2L), // ticks 9 + 10; the LATE
                                           // tick is earlier -> open
      ("2024-01-01 10:05:00.0", 3.0, 1L)
      // 10:09 held back: end > final watermark
    ), s"got: ${out.toSeq.sorted.mkString("\n")}")
  }
}
