package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Resample
import graft.streaming.StreamingOhlc

/** Streaming resampler converges to the batch OHLC result. */
class StreamingOhlcSpec extends SparkSpec {
  import spark.implicits._

  test("streaming 1-min OHLC over a replayed tick stream equals the " +
    "batch resample") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, Double, Double)]
    val ticks = mem.toDF()
      .toDF("datetime", "tick_id", "mid", "spread")

    val q = StreamingOhlc.ohlc1min(ticks, watermark = "2 minutes")
      .writeStream.outputMode("complete")
      .format("memory").queryName("ohlc_out").start()

    val data = Seq(
      (ts("2024-01-03 10:00:05"), 1L, 1.0, 0.01),
      (ts("2024-01-03 10:00:40"), 2L, 1.2, 0.03),
      (ts("2024-01-03 10:01:10"), 3L, 1.1, 0.02))
    mem.addData(data)
    q.processAllAvailable()
    val streamed = spark.table("ohlc_out").orderBy("datetime").collect()
    q.stop()

    val batch = Resample.ohlc1min(
      data.toDF("datetime", "tick_id", "mid", "spread"))
      .orderBy("datetime").collect()

    assert(streamed.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq)
  }

  test("replayToBatch drains a bounded file stream to exactly the batch " +
    "resample (the driver's g1_streaming_replay harness)") {
    val data = Seq(
      (ts("2024-01-03 10:00:05"), 1L, 1.0, 0.01),
      (ts("2024-01-03 10:00:40"), 2L, 1.2, 0.03),
      (ts("2024-01-03 10:01:10"), 3L, 1.1, 0.02),
      (ts("2024-01-03 10:07:55"), 4L, 1.3, 0.04)) // trailing window: the
    // append-mode watermark would never close it; complete-mode replay must
    val dir = java.nio.file.Files
      .createTempDirectory("graft_replay_spec").toString
    val batch = data.toDF("datetime", "tick_id", "mid", "spread")
    batch.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(batch.schema).parquet(dir)
    val replayed = StreamingOhlc.replayToBatch(
      spark, StreamingOhlc.ohlc1min(stream))
      .orderBy("datetime").collect()
    val expected = Resample.ohlc1min(batch).orderBy("datetime").collect()
    assert(replayed.map(_.toSeq).toSeq == expected.map(_.toSeq).toSeq)
    assert(replayed.length == 3) // 10:00, 10:01, 10:07 all emitted
  }

  test("append mode emits a window exactly once, only after the " +
    "watermark closes it — the mode the gap bridge consumes") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, Double, Double)]
    val ticks = mem.toDF().toDF("datetime", "tick_id", "mid", "spread")
    val q = StreamingOhlc.ohlc1min(ticks, watermark = "2 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("ohlc_append").start()

    mem.addData(
      (ts("2024-01-03 10:00:05"), 1L, 1.0, 0.01),
      (ts("2024-01-03 10:01:10"), 2L, 1.2, 0.02))
    q.processAllAvailable()
    // watermark = 10:01:10 - 2min → neither window is closed yet
    assert(spark.table("ohlc_append").count() == 0)

    mem.addData((ts("2024-01-03 10:05:00"), 3L, 1.4, 0.03))
    q.processAllAvailable()
    // watermark = 10:03 → 10:00 and 10:01 windows emit; 10:05 still open
    val emitted = spark.table("ohlc_append").orderBy("datetime").collect()
    q.stop()
    assert(emitted.map(_.getTimestamp(0)).toSeq ==
      Seq(ts("2024-01-03 10:00:00"), ts("2024-01-03 10:01:00")))
    assert(emitted(0).getAs[Double]("close") == 1.0)
    assert(emitted(1).getAs[Double]("open") == 1.2)
  }
}
