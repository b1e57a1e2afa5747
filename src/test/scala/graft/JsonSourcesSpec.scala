package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.sources.JsonSources

/** JSON-lines source: declared-schema scan, explicit-format timestamp
  * round-trip, malformed-line drop. */
class JsonSourcesSpec extends SparkSpec {
  import spark.implicits._

  test("S3: events round-trip through the JSON sink and scan, " +
    "microseconds intact") {
    val dir = "target/test-fixtures/json/events_rt"
    val src = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:07.179575"), "view", 6.55),
      (2L, Timestamp.valueOf("2024-01-02 23:59:59.000001"), "click", -1.0))
      .toDF("event_id", "ts", "event_type", "value")
    JsonSources.writeEvents(src, dir)
    val got = rows(JsonSources.loadEvents(spark, dir)
      .orderBy("event_id"))
    assert(got == rows(src.orderBy("event_id")))
  }

  test("S3: malformed JSON lines drop, valid lines survive") {
    val path = writeFixture("json", "events_bad.json",
      """{"event_id": 1, "ts": "2024-01-01 10:00:00.000000", "event_type": "view", "value": 1.5}
        |this is not json
        |{"event_id": 2, "ts": "2024-01-01 11:00:00.000000", "event_type": "click", "value": 2.5}
        |""".stripMargin)
    val got = JsonSources.loadEvents(spark, path)
    assert(got.count() == 2)
    assert(got.agg(sum(col("value"))).head().getDouble(0) == 4.0)
  }
}
