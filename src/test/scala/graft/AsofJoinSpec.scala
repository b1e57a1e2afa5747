package graft

import org.apache.spark.sql.functions._

import graft.ops.AsofJoin

/** As-of join semantics: latest-prior match per key, inclusive bound,
  * left-join NULLs, key isolation, and the all-columns-from-one-right-row
  * guarantee of the struct fill. */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private val right = Seq(
    ("A", "2024-01-01 10:00:00", 1.0, "r1"),
    ("A", "2024-01-01 10:05:00", 2.0, "r2"),
    ("B", "2024-01-01 10:03:00", 9.0, "r3"))
    .map { case (k, t, v, tag) => (k, ts(t), v, tag) }
    .toDF("k", "rt", "rv", "tag")

  private val left = Seq(
    ("A", "2024-01-01 09:59:00", 100L), // before any A checkpoint → NULL
    ("A", "2024-01-01 10:00:00", 101L), // exactly on r1 → inclusive match
    ("A", "2024-01-01 10:04:59", 102L), // between r1 and r2 → r1
    ("A", "2024-01-01 10:06:00", 103L), // after r2 → r2
    ("B", "2024-01-01 10:04:00", 104L), // B sees only B's checkpoint
    ("C", "2024-01-01 12:00:00", 105L)) // key with no right rows → NULL
    .map { case (k, t, id) => (k, ts(t), id) }
    .toDF("k", "lt", "id")

  private def result = AsofJoin.asof(left, right, Seq("k"), "lt", "rt",
    Seq("rv", "tag")).orderBy("id")

  test("latest prior right row per key, inclusive at equal time") {
    val got = result.select("id", "asof_rv", "asof_tag").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSeq
    assert(got == Seq(
      (100L, None, None),
      (101L, Some(1.0), Some("r1")),
      (102L, Some(1.0), Some("r1")),
      (103L, Some(2.0), Some("r2")),
      (104L, Some(9.0), Some("r3")),
      (105L, None, None)))
  }

  test("matched right timestamp is attached alongside the values") {
    val got = result.filter(col("id") === 103L)
      .select("asof_ts").head().getTimestamp(0)
    assert(got == ts("2024-01-01 10:05:00"))
  }

  test("left columns survive untouched, in order") {
    assert(result.columns.toSeq ==
      Seq("k", "lt", "id", "asof_ts", "asof_rv", "asof_tag"))
    assert(result.count() == 6)
  }

  test("empty right side yields all-NULL attachments") {
    val r = AsofJoin.asof(left, right.filter(lit(false)), Seq("k"),
      "lt", "rt", Seq("rv", "tag"))
    assert(r.count() == 6)
    assert(r.filter(col("asof_rv").isNotNull).count() == 0)
  }

  test("tolerance nulls matches further back than the bound, whole " +
    "row at once") {
    // 60 s tolerance: id 102 (4m59s after r1) and id 103 (1m after r2)
    // → only 101 (0 s) and 103 (60 s, inclusive) and 104 (60 s) keep
    // their match; the stale ones null BOTH the ts and the values
    val got = AsofJoin.asofTolerance(left, right, Seq("k"), "lt", "rt",
      Seq("rv", "tag"), toleranceSec = 60L).orderBy("id")
      .select("id", "asof_ts", "asof_rv", "asof_tag").collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(got(101L)._2.contains(1.0))
    assert(got(102L) == ((None, None, None))) // stale: 299 s back
    assert(got(103L)._3.contains("r2"))       // 60 s back, inclusive
    assert(got(104L)._2.contains(9.0))
    assert(got(100L) == ((None, None, None))) // never matched
  }
}
