package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingProfile

/** Windowed streaming profile: per-window stats, null accounting, and
  * late-row handling under the watermark. */
class StreamingProfileSpec extends SparkSpec {
  import spark.implicits._

  test("windowed profile computes per-minute stats incl. nulls") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Option[Double])]
    val rows = mem.toDF().toDF("ts", "value")

    val q = StreamingProfile.windowed(rows, "value")
      .writeStream.outputMode("complete")
      .format("memory").queryName("profile_out").start()

    mem.addData(Seq(
      (ts("2024-01-03 10:00:05"), Some(1.0)),
      (ts("2024-01-03 10:00:20"), None),
      (ts("2024-01-03 10:00:40"), Some(3.0)),
      (ts("2024-01-03 10:01:10"), Some(5.0))))
    q.processAllAvailable()
    val out = spark.table("profile_out").orderBy("window_start")
      .collect()
    q.stop()

    assert(out.length == 2)
    val m0 = out(0)
    assert(m0.getAs[java.sql.Timestamp]("window_start") ==
      ts("2024-01-03 10:00:00"))
    assert(m0.getAs[Long]("n_rows") == 3)
    assert(m0.getAs[Long]("value_nulls") == 1)
    assert(m0.getAs[Double]("value_min") == 1.0)
    assert(m0.getAs[Double]("value_max") == 3.0)
    assert(m0.getAs[Double]("value_avg") == 2.0)
    val m1 = out(1)
    assert(m1.getAs[Long]("n_rows") == 1 &&
      m1.getAs[Double]("value_min") == 5.0)
  }

  test("rows later than the watermark are dropped from closed windows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Option[Double])]
    val rows = mem.toDF().toDF("ts", "value")
    val q = StreamingProfile.windowed(rows, "value",
      watermark = "1 minute")
      .writeStream.outputMode("append")
      .format("memory").queryName("profile_late").start()

    // advance event time far enough to close the 10:00 window...
    mem.addData(Seq((ts("2024-01-03 10:00:10"), Some(1.0))))
    q.processAllAvailable()
    mem.addData(Seq((ts("2024-01-03 10:05:00"), Some(9.0))))
    q.processAllAvailable()
    // ...then replay a straggler into it: must be ignored
    mem.addData(Seq((ts("2024-01-03 10:00:30"), Some(100.0))))
    q.processAllAvailable()
    val emitted = spark.table("profile_late")
      .filter(col("window_start") === ts("2024-01-03 10:00:00")).collect()
    q.stop()
    assert(emitted.length == 1)
    assert(emitted(0).getAs[Long]("n_rows") == 1)
    assert(emitted(0).getAs[Double]("value_max") == 1.0)
  }
}
