package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingSessionize

/** Native session_window sessionization: gap-merge across micro-batches;
  * touching windows merge (diff == gap joins, only diff > gap splits). */
class StreamingSessionizeSpec extends SparkSpec {
  import spark.implicits._

  case class Ev(user_id: Long, ts: Timestamp, event_id: Long)

  test("events merge into gap-delimited sessions across batches; an " +
    "exact-gap arrival joins the session, a larger gap splits") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingSessionize.sessions(mem.toDF(), gap = "30 minutes")
      .writeStream.outputMode("complete")
      .format("memory").queryName("sess_out").start()

    // batch 1: user 1 opens a session with two events 10 min apart;
    // user 2 opens one
    mem.addData(
      Ev(1L, ts("2024-01-03 10:00:00"), 1L),
      Ev(1L, ts("2024-01-03 10:10:00"), 2L),
      Ev(2L, ts("2024-01-03 10:00:00"), 3L))
    q.processAllAvailable()
    // batch 2: user 1's 10:39 event is 29 min after 10:10 → MERGES into
    // the open session (cross-batch merge); user 2's 10:30 event is
    // EXACTLY the 30-min gap after 10:00 → touching windows merge, it
    // JOINS; the 11:01 event is 31 min later → new session
    mem.addData(
      Ev(1L, ts("2024-01-03 10:39:00"), 4L),
      Ev(2L, ts("2024-01-03 10:30:00"), 5L),
      Ev(2L, ts("2024-01-03 11:01:00"), 6L))
    q.processAllAvailable()
    val rows = spark.table("sess_out")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getTimestamp(3)))
      .sortBy(r => (r._1, r._2.getTime))
    q.stop()

    assert(rows.toSeq == Seq(
      (1L, ts("2024-01-03 10:00:00"), 3L, ts("2024-01-03 10:39:00")),
      (2L, ts("2024-01-03 10:00:00"), 2L, ts("2024-01-03 10:30:00")),
      (2L, ts("2024-01-03 11:01:00"), 1L, ts("2024-01-03 11:01:00"))))
  }
}
