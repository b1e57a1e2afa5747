package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.FusionOps
import graft.streaming.{StagedReplay, StreamingFusion, StreamingOhlc}

/** The J2 streaming twin (VERDICT r13 #1): a watermarked stream-stream
  * FULL OUTER equi-join on the minute key + per-column coalesce.
  *
  * Two contracts pinned here, mirroring the g10/StreamingLateDataSpec
  * discipline for the join operator instead of the windowed aggregate:
  *
  *  1. PARITY — with a watermark delay wider than the replay's
  *     disorder and a sentinel flush stage, the `AvailableNow` replay
  *     converges to EXACTLY the batch `combineFirst` (the
  *     `j2_streaming_fusion_replay` gate proves the same at sf scale
  *     against the DuckDB oracle; here a hand-built fixture keeps the
  *     mechanism visible).
  *  2. LATE DROP — with a TIGHT watermark, an M1 row arriving behind
  *     the eviction watermark is dropped at the join's late-input
  *     filter: an M1-ONLY minute vanishes from the streaming result
  *     (batch would emit it), while an in-time M1-only minute still
  *     emits its outer row at the flush. This is the bounded-state
  *     trade the 100 TB live fusion makes, stated rather than hidden.
  */
class StreamingFusionSpec extends SparkSpec {
  import spark.implicits._

  private def candles(rows: (String, Double, Double)*): DataFrame =
    rows.toSeq.map { case (t, c, s) => (ts(t), c, s) }
      .toDF("datetime", "close", "spread")

  /** M1 side: close only, no spread (the legacy feed's NaN spread). */
  private def m1Frame(rows: (String, Double)*): DataFrame =
    rows.toSeq.map { case (t, c) => (ts(t), c) }
      .toDF("datetime", "close")

  // must exceed max(event time) + the widest watermark delay used
  // below (2 days), else the flush watermark lands BEFORE the data
  // and the outer rows never emit
  private val flushTs = ts("2024-01-10 00:00:00")

  private def replay(tStages: Seq[DataFrame], mStages: Seq[DataFrame],
                     watermark: String, dir: String): Seq[Seq[Any]] = {
    val tDir = StagedReplay.stageFiles(tStages, s"$dir/t")
    val mDir = StagedReplay.stageFiles(mStages, s"$dir/m")
    def stream(p: String, schema: org.apache.spark.sql.types.StructType) =
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(p)
    StreamingOhlc.replayToBatchAppend(spark,
      StreamingFusion.combineFirstStream(
        stream(tDir, tStages.head.schema),
        stream(mDir, mStages.head.schema), watermark))
      .filter(col("datetime") < lit(flushTs))
      .orderBy(col("datetime"))
      .collect().toSeq.map(_.toSeq)
  }

  test("parity: wide-watermark staged replay == batch combineFirst, " +
    "including M1 rows arriving a batch AFTER their tick minute") {
    val t1 = candles(("2024-01-01 10:00:00", 1.0, 0.5),
      ("2024-01-01 10:01:00", 2.0, 0.6))
    val t2 = candles(("2024-01-01 10:02:00", 3.0, 0.7))
    // m1 for 10:00 arrives in stage 2 — AFTER the tick row; 10:03 and
    // 10:04 are m1-only minutes (outer rows, emitted at the flush)
    val m1 = m1Frame(("2024-01-01 10:03:00", 30.0))
    val m2 = m1Frame(("2024-01-01 10:00:00", 10.0),
      ("2024-01-01 10:04:00", 40.0))
    val sentT = candles((flushTs.toString, 0.0, 0.0))
    val sentM = m1Frame((flushTs.toString, 0.0))
    val got = replay(Seq(t1, t2, sentT), Seq(m1, m2, sentM),
      "2 days", "target/test-fixtures/fusion_parity")
    val want = FusionOps.combineFirst(
      t1.unionByName(t2), m1.unionByName(m2))
      .orderBy(col("datetime")).collect().toSeq.map(_.toSeq)
    assert(got == want)
    // and the fused shape is the J2 one: tick close wins on 10:00,
    // m1-only minutes carry null spread (tick-only column)
    val byMinute = got.map(r => r.head.toString -> r.tail).toMap
    assert(byMinute("2024-01-01 10:00:00.0") == Seq(1.0, 0.5))
    assert(byMinute("2024-01-01 10:03:00.0") == Seq(30.0, null))
  }

  test("late drop: behind-watermark M1-only minute vanishes (bounded " +
    "state); in-time M1-only minute still emits its outer row") {
    // stage 1 advances both sides' event time to 10:20 → after batch 1
    // the watermark is 10:18 (delay 2 min). The join's late filter is
    // ONE BATCH LAGGED (SPARK-40925, same contract
    // StreamingLateDataSpec pins for the windowed aggregate), so the
    // late arrival goes in stage THREE: batch 3's filter uses the
    // watermark batch 2 evicted with (= through batch 1 = 10:18) —
    // 10:03 < 10:18 → dropped at the join input; 10:19 admitted.
    val t1 = candles(("2024-01-01 10:00:00", 1.0, 0.5),
      ("2024-01-01 10:01:00", 2.0, 0.6),
      ("2024-01-01 10:20:00", 9.0, 0.9))
    val m1 = m1Frame(("2024-01-01 10:00:00", 10.0),
      ("2024-01-01 10:20:00", 90.0))
    val t2 = candles(("2024-01-01 10:21:00", 9.5, 0.9)) // filler batch
    val m2 = m1Frame()
    val t3 = candles()
    val m3 = m1Frame(("2024-01-01 10:03:00", 30.0), // LATE: dropped
      ("2024-01-01 10:19:00", 19.0)) // in time: admitted
    val sentT = candles((flushTs.toString, 0.0, 0.0))
    val sentM = m1Frame((flushTs.toString, 0.0))
    val got = replay(Seq(t1, t2, t3, sentT), Seq(m1, m2, m3, sentM),
      "2 minutes", "target/test-fixtures/fusion_late")
    val minutes = got.map(_.head.toString)
    assert(!minutes.contains("2024-01-01 10:03:00.0"),
      "behind-watermark m1-only minute must be dropped")
    val byMinute = got.map(r => r.head.toString -> r.tail).toMap
    assert(byMinute("2024-01-01 10:19:00.0") == Seq(19.0, null),
      "in-time m1-only minute emits its outer row at the flush")
    // on-time fusion is unaffected
    assert(byMinute("2024-01-01 10:00:00.0") == Seq(1.0, 0.5))
    assert(byMinute("2024-01-01 10:01:00.0") == Seq(2.0, 0.6))
    assert(byMinute("2024-01-01 10:20:00.0") == Seq(9.0, 0.9))
  }
}
