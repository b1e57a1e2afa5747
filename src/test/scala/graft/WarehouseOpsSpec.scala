package graft

import graft.ext.{DataProfile, EventAnalytics, GraphOps}

/** The warehouse/audit operators over hand-built fixtures: association
  * rules (e131), quantile normalization (e132), TWAP (e133), and the
  * Benford digit screen (e134). */
class WarehouseOpsSpec extends SparkSpec {
  import spark.implicits._

  test("E131: support, confidence, and lift from basket counts") {
    // baskets: 1 = {A, B}, 2 = {A, B}, 3 = {A} (A = 100, B = 200)
    val pairs = Seq((1L, 100L), (1L, 200L), (2L, 100L), (2L, 200L),
      (3L, 100L)).toDF("c", "sp")
    val r = GraphOps.associationRules(pairs, minShared = 2L).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getAs[Long]("node_a") == 100L)
    assert(row.getAs[Long]("n_shared") == 2L)
    assert(row.getAs[Long]("supp_a") == 3L)
    assert(row.getAs[Long]("supp_b") == 2L)
    assert(row.getAs[Double]("conf_ab") ==
      Rounding.duckRoundDouble(2.0 / 3, 6))
    assert(row.getAs[Double]("conf_ba") == 1.0)
    // lift = n_shared·N / (supp_a·supp_b) = 2·3 / (3·2) = 1
    assert(row.getAs[Double]("lift") == 1.0)
  }

  test("E132: each source's ranks map onto the key-wide bin means") {
    // en: srcA = {1, 2}, srcB = {11, 12}; lang-wide halves mean 1.5
    // and 11.5 — every source's lower half maps to 1.5, upper to 11.5
    val docs = Seq((1L, "en", "srcA", 1L), (2L, "en", "srcA", 2L),
      (3L, "en", "srcB", 11L), (4L, "en", "srcB", 12L))
      .toDF("doc_id", "lang", "source", "n_chars")
    val got = DataProfile.quantileNormalize(docs, "lang", "source",
        "doc_id", "n_chars", n = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("bin"), r.getAs[Double]("normalized"))).toMap
    assert(got(1L) == (1L, 1.5) && got(3L) == (1L, 1.5))
    assert(got(2L) == (2L, 11.5) && got(4L) == (2L, 11.5))
  }

  test("E133: duration-weighted mean; the day's last event carries " +
    "no weight") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), 10.0), //  60 s at 10
      (1L, 2L, ts("2024-01-01 10:01:00"), 20.0), // 180 s at 20
      (1L, 3L, ts("2024-01-01 10:04:00"), 99.0)) // terminal: no weight
      .toDF("user_id", "event_id", "ts", "value")
    val r = EventAnalytics.twap(ev).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_seg") == 2L)
    // (10·60 + 20·180) / 240 = 17.5
    assert(r(0).getAs[Double]("twap") == 17.5)
  }

  test("E137: every event gets the SCD2 state of ITS OWN timestamp, " +
    "boundary events belong to the opening interval") {
    import org.apache.spark.sql.functions.col
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "A"),
      (1L, 2L, ts("2024-01-01 11:00:00"), "A"),
      (1L, 3L, ts("2024-01-01 12:00:00"), "B"), // state flips here
      (1L, 4L, ts("2024-01-01 13:00:00"), "B"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val dim = EventAnalytics.scd2History(ev)
      .select(col("user_id"), col("valid_from"),
        col("event_type").as("state_type"))
    val got = graft.ops.AsofJoin.asof(
        ev.select(col("user_id"), col("event_id"), col("ts")),
        dim, Seq("user_id"), "ts", "valid_from", Seq("state_type"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        r.getAs[String]("asof_state_type")).toMap
    assert(got == Map(1L -> "A", 2L -> "A", 3L -> "B", 4L -> "B"))
  }

  test("E139: same token → same signed bucket; counts keep " +
    "multiplicity") {
    val docs = Seq((1L, "x x y"), (2L, "x")).toDF("doc_id", "text")
    val rows = graft.ext.TextAnalysis.featureHash(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bucket")) ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("signed_sum")))
      .toMap
    val bx = rows.keys.filter(_._1 == 2L).head._2
    // doc 1 has "x" twice: same bucket as doc 2's single "x", double
    // the count, and the signed sum scales with the count
    val (n1, s1) = rows((1L, bx))
    val (n2, s2) = rows((2L, bx))
    assert(n2 == 1L && (n1 == 2L || n1 == 3L))
    assert(math.abs(s2) == 1L)
    if (n1 == 2L) assert(s1 == 2L * s2) // x,y in different buckets
  }

  test("E138: purchases credit the latest fresh touch; stale or " +
    "absent touches fall to direct") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, 2L, ts("2024-01-01 11:00:00"), "click"),
      (1L, 3L, ts("2024-01-01 12:00:00"), "purchase"), // → click 2
      (1L, 4L, ts("2024-01-20 12:00:00"), "purchase"), // stale → direct
      (2L, 5L, ts("2024-01-01 09:00:00"), "purchase")) // no touch
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = EventAnalytics.lastTouchAttribution(ev).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[String]("touch_type"),
          Option(r.getAs[java.lang.Long]("touch_event_id")))).toMap
    assert(got(3L) == ("click", Some(2L)))
    assert(got(4L) == ("direct", None))
    assert(got(5L) == ("direct", None))
  }

  test("E140: a soft rule over budget fails; hard rules at zero " +
    "violations pass") {
    import org.apache.spark.sql.functions.col
    val df = Seq(1.0, 2.0, 150.0, 3.0).toDF("value")
    val got = DataProfile.expectations(df, Seq(
        ("positive", col("value") > 0, 0.0),
        ("le_100_soft", col("value") <= 100.0, 0.10)))
      .collect().map(r => r.getAs[String]("rule_name") ->
        (r.getAs[Long]("n_violations"), r.getAs[Boolean]("passed")))
      .toMap
    assert(got("positive") == (0L, true))
    // 1 of 4 = 25% > the 10% budget
    assert(got("le_100_soft") == (1L, false))
  }

  test("E141: tie-broken cume_dist is exactly rank/n") {
    val ev = Seq((1L, "a", 5.0), (2L, "a", 1.0), (3L, "a", 3.0),
      (4L, "a", 3.0)).toDF("event_id", "event_type", "value")
    val got = EventAnalytics.cdfTransform(ev).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("cdf"))
      .toMap
    // order: (1.0,#2) (3.0,#3) (3.0,#4) (5.0,#1) — ranks 1..4 of 4
    assert(got(2L) == 0.25 && got(3L) == 0.5 &&
      got(4L) == 0.75 && got(1L) == 1.0)
  }

  test("E143: a 7-day-old item weighs exactly half the anchor item") {
    val li = Seq(
      (1L, ts("2024-01-08 00:00:00")), // anchor: weight 1
      (1L, ts("2024-01-01 00:00:00")), // one half-life: weight 0.5
      (2L, ts("2024-01-08 00:00:00")))
      .toDF("l_suppkey", "l_shipdate")
    val got = EventAnalytics.decayTrending(li, halfLifeDays = 7.0)
      .collect().map(r => r.getAs[Long]("l_suppkey") ->
        (r.getAs[Double]("score"), r.getAs[Long]("rnk"))).toMap
    assert(got(1L) == (1.5, 1L))
    assert(got(2L) == (1.0, 2L))
  }

  test("E144: the snapshot keeps exactly the (ts, event_id)-latest " +
    "row per key") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "view", 1.0),
      (1L, 3L, ts("2024-01-02 10:00:00"), "click", 2.0),
      (1L, 2L, ts("2024-01-02 10:00:00"), "error", 9.0)) // ts tie
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val got = EventAnalytics.latestState(ev).collect()
    assert(got.length == 1)
    // the tie breaks on event_id: 3 beats 2
    assert(got(0).getAs[Long]("last_event_id") == 3L)
    assert(got(0).getAs[String]("last_type") == "click")
  }

  test("E145: new / retained / churned / resurrected balance the " +
    "weekly ledger") {
    // weeks W1 = Jan 1, W2 = Jan 8, W3 = Jan 15 (all Mondays).
    // u1: W1, W2, W3 (retained twice); u2: W1 only (churns into W2);
    // u3: W1, W3 (resurrected in W3); u4: W2 only (new in W2)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-08 10:00:00")),
      (1L, ts("2024-01-15 10:00:00")),
      (2L, ts("2024-01-02 10:00:00")),
      (3L, ts("2024-01-03 10:00:00")), (3L, ts("2024-01-16 10:00:00")),
      (4L, ts("2024-01-09 10:00:00")))
      .toDF("user_id", "ts")
    val got = EventAnalytics.churnMatrix(ev).collect()
      .map(r => r.getAs[java.sql.Timestamp]("wk").toString.take(10) ->
        (r.getAs[Long]("n_active"), r.getAs[Long]("n_new"),
          r.getAs[Long]("n_retained"), r.getAs[Long]("n_resurrected"),
          r.getAs[Long]("n_churned_in"))).toMap
    assert(got("2024-01-01") == (3L, 3L, 0L, 0L, 0L))
    // W2: u1 retained, u4 new; u2 and u3 churned in
    assert(got("2024-01-08") == (2L, 1L, 1L, 0L, 2L))
    // W3: u1 retained, u3 resurrected; u4 churned in
    assert(got("2024-01-15") == (2L, 0L, 1L, 1L, 1L))
  }

  test("E146: a perfectly balanced contingency table has zero chi2") {
    // 2 types × 2 consecutive days, equal counts — independence holds
    val ev = Seq(
      ("a", ts("2024-01-01 10:00:00")), ("a", ts("2024-01-02 10:00:00")),
      ("b", ts("2024-01-01 11:00:00")), ("b", ts("2024-01-02 11:00:00")))
      .toDF("event_type", "ts")
    val got = DataProfile.chisqIndependence(ev, "event_type", "ts")
      .collect()
    assert(got.length == 4)
    assert(got.forall(_.getAs[Double]("chi2_term") == 0.0))
    assert(got.forall(_.getAs[Double]("expected") == 1.0))
    // 2024-01-01 is a Monday: epoch-day arithmetic puts it at dow 1
    assert(got.map(_.getAs[Long]("dow")).toSet == Set(1L, 2L))
  }

  test("E147: phrase order matters; overlapping matches all count") {
    val docs = Seq(
      (1L, "a b c a b"),   // "a b" twice
      (2L, "b a b a"),     // "a b" once (pos 2), "b a" is NOT it
      (3L, "a a a"),       // self-overlap: "a a" at pos 1 and 2
      (4L, "b b"))         // no match
      .toDF("doc_id", "text")
    val ab = graft.ext.TextAnalysis.phraseSearch(docs, Seq("a", "b"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_matches"), r.getAs[Long]("first_pos")))
      .toMap
    assert(ab == Map(1L -> (2L, 1L), 2L -> (1L, 2L)))
    val aa = graft.ext.TextAnalysis.phraseSearch(docs, Seq("a", "a"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("n_matches")).toMap
    assert(aa == Map(3L -> 2L))
    // a 3-term phrase chains two adjacency joins
    val abc = graft.ext.TextAnalysis
      .phraseSearch(docs, Seq("a", "b", "c"))
      .collect().map(r => r.getAs[Long]("doc_id")).toSet
    assert(abc == Set(1L))
  }

  test("E148: applying the diff reproduces the target snapshot " +
    "row-for-row") {
    import org.apache.spark.sql.functions.col
    val old = Seq((1L, "keep"), (2L, "drop"), (3L, "edit me"))
      .toDF("doc_id", "text")
    val target = Seq((1L, "keep"), (3L, "edited"), (4L, "brand new"))
      .toDF("doc_id", "text")
    val merged = graft.ext.Cdc.applyDiff(old, target,
      graft.ext.Cdc.snapshotDiff(old, target))
    val got = merged.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
      .toSet
    assert(got == Set((1L, "keep"), (3L, "edited"), (4L, "brand new")))
  }

  test("E149: CUBE emits every margin with the grouping-id contract") {
    val li = Seq(("A", "F", 2.0), ("A", "O", 3.0), ("R", "F", 5.0))
      .toDF("l_returnflag", "l_linestatus", "l_quantity")
    val got = EventAnalytics.cubeStats(li).collect()
      .map(r => (Option(r.getAs[String]("l_returnflag")),
        Option(r.getAs[String]("l_linestatus")),
        r.getAs[Long]("gid")) -> r.getAs[Double]("sum_qty")).toMap
    assert(got((Some("A"), Some("F"), 0L)) == 2.0)
    assert(got((Some("A"), None, 1L)) == 5.0)   // A margin
    assert(got((None, Some("F"), 2L)) == 7.0)   // F margin
    assert(got((None, None, 3L)) == 10.0)       // grand total
    assert(got.size == 3 + 2 + 2 + 1)
  }

  test("E150: the trailing frame sees exactly the last 24 h " +
    "including the purchase itself") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "view", 10.0),  // 25h old
      (1L, 2L, ts("2024-01-02 09:30:00"), "view", 20.0),  // in window
      (1L, 3L, ts("2024-01-02 10:30:00"), "click", 30.0), // in window
      (1L, 4L, ts("2024-01-02 11:00:00"), "purchase", 40.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val r = EventAnalytics.trailingFeatures(ev).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_events_24h") == 3L)
    assert(r(0).getAs[Long]("n_view_24h") == 1L)
    assert(r(0).getAs[Long]("n_click_24h") == 1L)
    assert(r(0).getAs[Double]("avg_value_24h") == 30.0) // (20+30+40)/3
  }

  test("E134: digits come from the cents string — powers of ten " +
    "classify exactly") {
    // 1000.00 is the float-log10 trap (log10 can land at 2.999…);
    // the string head is exact
    val li = Seq(1000.00, 999.99, 123.45, 987.65)
      .toDF("l_extendedprice")
    val got = DataProfile.benfordDigits(li, "l_extendedprice")
      .collect().map(r => r.getAs[Int]("digit") ->
        r.getAs[Long]("n_obs")).toMap
    assert(got == Map(1 -> 2L, 9 -> 2L))
    // shares and the Benford expectation are the rounded identities
    val row = DataProfile.benfordDigits(li, "l_extendedprice")
      .filter("digit = 1").collect()(0)
    assert(row.getAs[Double]("share") == 0.5)
    assert(row.getAs[Double]("benford_p") ==
      Rounding.duckRoundDouble(math.log(2.0) / math.log(10.0), 6))
  }
}
