package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingAttribution
import graft.streaming.StreamingAttribution.{EventIn, TouchOut}

/** Streaming last-touch attribution: the touch carries across
  * micro-batches, purchases emit on arrival, staleness falls to
  * direct. */
class StreamingAttributionSpec extends SparkSpec {
  import spark.implicits._

  test("touch state carries across batches; stale touches fall to " +
    "direct") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventIn]
    val q = StreamingAttribution.attribute(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("attr_out").start()
    // batch 1: a view, then an out-of-order click BEFORE it — the
    // in-batch sort must leave the view as the latest touch
    mem.addData(
      EventIn(1L, 11L, ts("2024-01-01 11:00:00"), "view"),
      EventIn(1L, 10L, ts("2024-01-01 10:00:00"), "click"))
    q.processAllAvailable()
    // batch 2: a purchase (credits the batch-1 view), then weeks of
    // silence, then a stale purchase
    mem.addData(
      EventIn(1L, 12L, ts("2024-01-01 12:00:00"), "purchase"),
      EventIn(1L, 13L, ts("2024-01-20 12:00:00"), "purchase"),
      EventIn(2L, 14L, ts("2024-01-01 09:00:00"), "purchase"))
    q.processAllAvailable()
    val rows = spark.table("attr_out").as[TouchOut].collect()
      .map(r => r.event_id -> (r.touch_type, r.touch_event_id)).toMap
    q.stop()
    assert(rows(12L) == ("view", Some(11L)))
    assert(rows(13L) == ("direct", None))
    assert(rows(14L) == ("direct", None))
    assert(rows.size == 3) // touches themselves emit nothing
  }
}
