package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ext.EventAnalytics

/** Funnel and retention over a hand-built four-user event log. */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  // u1 completes the funnel in order; u2 clicks BEFORE viewing (click
  // must not count) then never re-clicks; u3 views only; u4 has no view
  // at all (excluded).
  private def events = Seq(
    (1L, ts("2024-01-01 10:00:00"), "view", 1.0),
    (1L, ts("2024-01-01 10:05:00"), "click", 1.0),
    (1L, ts("2024-01-02 09:00:00"), "purchase", 9.5),
    (2L, ts("2024-01-01 08:00:00"), "click", 1.0),
    (2L, ts("2024-01-01 09:00:00"), "view", 1.0),
    (2L, ts("2024-01-03 09:00:00"), "purchase", 3.0),
    (3L, ts("2024-01-02 12:00:00"), "view", 1.0),
    (4L, ts("2024-01-01 12:00:00"), "purchase", 2.0))
    .toDF("user_id", "ts", "event_type", "value")

  test("E39: funnel orders steps and excludes pre-view clicks") {
    val rows = EventAnalytics.funnel(events).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Timestamp]("view_ts"), r.getAs[Timestamp]("click_ts"),
          r.getAs[Timestamp]("purchase_ts"))).toMap
    assert(rows.keySet == Set(1L, 2L, 3L))
    assert(rows(1L) == (ts("2024-01-01 10:00:00"),
      ts("2024-01-01 10:05:00"), ts("2024-01-02 09:00:00")))
    // u2's only click precedes the first view → no click step, and the
    // purchase (which would follow a click) must not fire either
    assert(rows(2L)._2 == null && rows(2L)._3 == null)
    assert(rows(3L)._2 == null && rows(3L)._3 == null)
  }

  test("E40: retention cohorts by first-event day with day offsets") {
    val r = EventAnalytics.retention(events, maxOffset = 7).collect()
      .map(row => (row.getAs[Timestamp]("cohort_day"),
        row.getAs[Int]("day_offset")) -> row.getAs[Long]("n_users"))
      .toMap
    val d1 = ts("2024-01-01 00:00:00")
    val d2 = ts("2024-01-02 00:00:00")
    // cohort Jan-1 = {u1, u2, u4}: all active day 0; u1 returns day 1,
    // u2 returns day 2. cohort Jan-2 = {u3}: active day 0 only.
    assert(r((d1, 0)) == 3L && r((d1, 1)) == 1L && r((d1, 2)) == 1L)
    assert(r((d2, 0)) == 1L)
    assert(r.size == 4)
  }

  test("E48: rolling active users counts distinct users over the " +
    "trailing window, capped at the last data day") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view", 1.0),
      (2L, ts("2024-01-01 11:00:00"), "view", 1.0),
      (2L, ts("2024-01-02 10:00:00"), "click", 1.0),
      (3L, ts("2024-01-04 10:00:00"), "view", 1.0))
      .toDF("user_id", "ts", "event_type", "value")
    val r = EventAnalytics.rollingActiveUsers(ev, window = 2).collect()
      .map(row => row.getAs[Timestamp]("as_of_day") ->
        row.getAs[Long]("wau")).toMap
    assert(r == Map(
      ts("2024-01-01 00:00:00") -> 2L, // u1, u2
      ts("2024-01-02 00:00:00") -> 2L, // u1 (d1), u2
      ts("2024-01-03 00:00:00") -> 1L, // u2 (d2)
      ts("2024-01-04 00:00:00") -> 1L)) // u3; d5 capped away
  }

  test("E44: daily type stats roll a 3-day trailing mean over the " +
    "aggregated frame") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view", 2.0),
      (1L, ts("2024-01-01 11:00:00"), "view", 4.0),
      (1L, ts("2024-01-02 10:00:00"), "view", 8.0),
      (1L, ts("2024-01-03 10:00:00"), "view", 2.0),
      (1L, ts("2024-01-04 10:00:00"), "view", 10.0))
      .toDF("user_id", "ts", "event_type", "value")
    val r = EventAnalytics.dailyTypeStats(ev).collect()
      .map(row => row.getAs[Timestamp]("day") ->
        (row.getAs[Long]("n_events"), row.getAs[Double]("sum_value"),
          row.getAs[Double]("sum_value_3d"))).toMap
    assert(r(ts("2024-01-01 00:00:00")) == ((2L, 6.0, 6.0)))
    assert(r(ts("2024-01-02 00:00:00")) == ((1L, 8.0, 7.0)))
    // day 3: mean(6, 8, 2); day 4: mean(8, 2, 10) — trailing 3 only
    assert(math.abs(r(ts("2024-01-03 00:00:00"))._3 - 5.333333) < 1e-6)
    assert(math.abs(r(ts("2024-01-04 00:00:00"))._3 - 6.666667) < 1e-6)
  }

  test("E100: ewma matches the pandas adjust=True recurrence") {
    val series = Seq(10.0, 20.0, 5.0, 40.0)
    val df = series.zipWithIndex.map { case (v, i) =>
      (7L, ts(f"2024-01-01 10:0$i:00"), i.toLong, v)
    }.toDF("user_id", "ts", "event_id", "value")
    val got = EventAnalytics.ewma(df, alpha = 0.1)
      .orderBy(col("event_id")).select(col("ewma_value"))
      .as[Double].collect()
    // reference: y_i = Σ (1-α)^(i-j) x_j / Σ (1-α)^(i-j)
    val want = series.indices.map { i =>
      val ws = (0 to i).map(j => math.pow(0.9, i - j))
      (0 to i).map(j => ws(j) * series(j)).sum / ws.sum
    }
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-5, s"got $g want $w")
    }
    // the smoother tracks level shifts without overshooting: every
    // output lies inside the running min/max envelope
    series.indices.foreach { i =>
      assert(got(i) >= series.take(i + 1).min - 1e-9 &&
        got(i) <= series.take(i + 1).max + 1e-9)
    }
  }

  test("E101: MAD flags only genuine tail points") {
    // 20 tightly packed values + two gross outliers
    val base = (0 until 20).map(i => (i.toLong,
      ts(f"2024-01-01 10:${i}%02d:00"), "click", 50.0 + (i % 5)))
    val out = Seq((100L, ts("2024-01-01 11:00:00"), "click", 500.0),
      (101L, ts("2024-01-01 11:01:00"), "click", -400.0))
    val df = (base ++ out).toDF("event_id", "ts", "event_type", "value")
    val flagged = EventAnalytics.madOutliers(df, k = 3.0)
      .filter(col("is_outlier")).select(col("event_id"))
      .as[Long].collect().toSet
    assert(flagged == Set(100L, 101L))
  }
}
