package graft

import org.apache.spark.sql.functions._

import graft.ext.{DataProfile, EventAnalytics}

/** The quant/warehouse series operators over hand-built fixtures with
  * closed-form expectations: drawdown (e118), anchored VWAP (e119),
  * least-squares trend (e120), correlation matrix (e121), Markov
  * transitions (e122), autocorrelation (e123). */
class QuantSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("E118: drawdown tracks the running peak and its causal max") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), 10.0),
      (1L, 2L, ts("2024-01-01 10:01:00"), 5.0),
      (1L, 3L, ts("2024-01-01 10:02:00"), 20.0),
      (1L, 4L, ts("2024-01-01 10:03:00"), 4.0),
      (2L, 5L, ts("2024-01-01 10:00:00"), 8.0))
      .toDF("user_id", "event_id", "ts", "value")
    val got = EventAnalytics.maxDrawdown(ev).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Double]("peak"), r.getAs[Double]("drawdown"),
          r.getAs[Double]("max_drawdown"))).toMap
    assert(got(1L) == (10.0, 0.0, 0.0))
    assert(got(2L) == (10.0, 0.5, 0.5))
    // new high resets the drawdown but the causal max remembers
    assert(got(3L) == (20.0, 0.0, 0.5))
    assert(got(4L) == (20.0, 0.8, 0.8))
    assert(got(5L) == (8.0, 0.0, 0.0))
  }

  test("E119: anchored VWAP is the running cents-exact ratio") {
    val li = Seq(
      (7L, 1L, 1, ts("2024-01-01 00:00:00"), 10.00, 2.0),
      (7L, 2L, 1, ts("2024-01-02 00:00:00"), 20.00, 2.0),
      (7L, 3L, 1, ts("2024-01-03 00:00:00"), 40.00, 4.0),
      (8L, 4L, 1, ts("2024-01-01 00:00:00"), 5.50, 3.0))
      .toDF("l_partkey", "l_orderkey", "l_linenumber", "l_shipdate",
        "l_extendedprice", "l_quantity")
    val got = EventAnalytics.anchoredVwap(li).collect()
      .map(r => r.getAs[Long]("l_orderkey") -> r.getAs[Double]("vwap"))
      .toMap
    assert(got(1L) == 10.0)
    assert(got(2L) == 15.0) // (20 + 40) / 4
    assert(got(3L) == 27.5) // (20 + 40 + 160) / 8
    assert(got(4L) == 5.5)
  }

  test("E120: a perfect line recovers slope/intercept exactly, R2 = 1") {
    // x = 0,1,2,3 days → var_pop = 1.25 (exact decimal), y = 2x + 1
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), "a", 1.0),
      (2L, ts("2024-01-02 00:00:00"), "a", 3.0),
      (3L, ts("2024-01-03 00:00:00"), "a", 5.0),
      (4L, ts("2024-01-04 00:00:00"), "a", 7.0))
      .toDF("event_id", "ts", "event_type", "value")
    val r = EventAnalytics.trendRegression(ev).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n") == 4L)
    assert(r(0).getAs[Double]("slope") == 2.0)
    assert(r(0).getAs[Double]("intercept") == 1.0)
    assert(r(0).getAs[Double]("r2") == 1.0)
  }

  test("E121: corr matrix emits one labeled row per pair") {
    val df = Seq((1.0, 2.0, 5.0), (2.0, 4.0, 4.0), (3.0, 6.0, 3.0),
      (4.0, 8.0, 2.0)).toDF("a", "b", "c")
    val got = DataProfile.corrMatrix(df, Seq("a", "b", "c")).collect()
      .map(r => (r.getAs[String]("col_x"), r.getAs[String]("col_y")) ->
        r.getAs[Double]("pearson")).toMap
    assert(got.size == 3)
    assert(got(("a", "b")) == 1.0)  // b = 2a
    assert(got(("a", "c")) == -1.0) // c = 6 - a
    assert(got(("b", "c")) == -1.0)
  }

  test("E122: transition counts row-normalize per source state") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "A"),
      (1L, 2L, ts("2024-01-01 10:01:00"), "B"),
      (1L, 3L, ts("2024-01-01 10:02:00"), "A"),
      (1L, 4L, ts("2024-01-01 10:03:00"), "B"),
      (2L, 5L, ts("2024-01-01 10:00:00"), "A"),
      (2L, 6L, ts("2024-01-01 10:01:00"), "A"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = EventAnalytics.markovTransitions(ev).collect()
      .map(r => (r.getAs[String]("prev_type"),
        r.getAs[String]("next_type")) ->
        (r.getAs[Long]("n"), r.getAs[Double]("p"))).toMap
    assert(got(("A", "B")) == (2L, Rounding.duckRoundDouble(2.0 / 3, 6)))
    assert(got(("A", "A")) == (1L, Rounding.duckRoundDouble(1.0 / 3, 6)))
    assert(got(("B", "A")) == (1L, 1.0))
    // per-source probabilities sum to 1 (up to the rounding grain)
    assert(got.keys.map(_._1).toSet == Set("A", "B"))
  }

  test("E123: a linear series autocorrelates at 1 for every lag") {
    val ev = (1 to 6).map(i =>
      (i.toLong, ts(f"2024-01-01 10:0$i:00"), "a", i.toDouble))
      .toDF("event_id", "ts", "event_type", "value")
    val r = EventAnalytics.acf(ev).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Double]("acf1") == 1.0)
    assert(r(0).getAs[Double]("acf2") == 1.0)
    assert(r(0).getAs[Double]("acf3") == 1.0)
  }

  test("E128: a 2-point frequency spectrum fits its exact line") {
    // "a" ×4, "b" ×2 → (ln 1, ln 4), (ln 2, ln 2): slope −1, R² 1
    val docs = Seq((1L, "a a b"), (2L, "a a b"))
      .toDF("doc_id", "text")
    val r = graft.ext.TextAnalysis.zipfFit(docs).collect()
    assert(r.length == 1 && r(0).getAs[Long]("n_terms") == 2L)
    assert(math.abs(r(0).getAs[Double]("slope") + 1.0) < 1e-5)
    assert(r(0).getAs[Double]("r2") > 0.999999)
  }

  test("E129: realized volatility sums within-day squared log " +
    "returns; days are independent") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), 10.0),
      (1L, 2L, ts("2024-01-01 11:00:00"), 20.0),
      (1L, 3L, ts("2024-01-01 12:00:00"), 40.0),
      // next day: a single event → no return, no row
      (1L, 4L, ts("2024-01-02 09:00:00"), 80.0))
      .toDF("user_id", "event_id", "ts", "value")
    val r = EventAnalytics.realizedVolatility(ev).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_ret") == 2L)
    val ln2sq = math.log(2.0) * math.log(2.0)
    assert(r(0).getAs[Double]("rv") ==
      Rounding.duckRoundDouble(ln2sq + ln2sq, 6))
  }

  test("E151: a planted bid-ask bounce yields the Roll estimate; " +
    "positive autocovariance clamps to zero") {
    // alternating 10/11: successive changes are perfectly negatively
    // autocovariant — the bounce signature
    val ev = (1 to 5).map(i =>
      (1L, i.toLong, ts(f"2024-01-01 10:0$i:00"),
        if (i % 2 == 1) 10.0 else 11.0))
      .toDF("user_id", "event_id", "ts", "value")
    val r = EventAnalytics.rollSpread(ev).collect()
    assert(r.length == 1 && r(0).getAs[Long]("n_pairs") == 3L)
    // replicate: dp = [-1,1,-1], prev = [1,-1,1] → cov_pop = -8/9
    val cov = Rounding.duckRoundDouble(-8.0 / 9, 6)
    assert(r(0).getAs[Double]("cov_dp") == cov)
    assert(r(0).getAs[Double]("roll_spread") ==
      Rounding.duckRoundDouble(2.0 * math.sqrt(-cov), 6))
    // a trending series (positive autocov) clamps to 0
    val trend = (1 to 5).map(i =>
      (2L, i.toLong, ts(f"2024-01-01 10:0$i:00"), i * 10.0))
      .toDF("user_id", "event_id", "ts", "value")
    val t = EventAnalytics.rollSpread(trend).collect()
    assert(t(0).getAs[Double]("roll_spread") == 0.0)
  }

  test("E152: a period-2 oscillation has zero 4-step variance — " +
    "VR(4) = 0") {
    val ev = (1 to 8).map(i =>
      (i.toLong, ts(f"2024-01-01 10:0$i:00"), "a",
        if (i % 2 == 1) 0.0 else 2.0))
      .toDF("event_id", "ts", "event_type", "value")
    val r = EventAnalytics.varianceRatio(ev).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Double]("v4") == 0.0)
    assert(r(0).getAs[Double]("vr4") == 0.0)
  }

  test("E153: weekday means over the group mean; indices average " +
    "out around 1") {
    // Monday runs at 20, Tuesday at 10 → type mean 15
    val ev = Seq(
      ("a", ts("2024-01-01 10:00:00"), 20.0), // Monday
      ("a", ts("2024-01-01 11:00:00"), 20.0),
      ("a", ts("2024-01-02 10:00:00"), 10.0), // Tuesday
      ("a", ts("2024-01-02 11:00:00"), 10.0))
      .toDF("event_type", "ts", "value")
    val got = graft.ext.DataProfile
      .seasonalIndex(ev, "event_type", "ts", "value")
      .collect().map(r => r.getAs[Long]("dow") ->
        r.getAs[Double]("seasonal_index")).toMap
    assert(got(1L) == Rounding.duckRoundDouble(20.0 / 15, 6))
    assert(got(2L) == Rounding.duckRoundDouble(10.0 / 15, 6))
  }

  test("E162: KM censors the open tail gap and drops to exactly 0 " +
    "when the risk set empties") {
    // one user at 00:00, 01:00, 03:00 → closed gaps of 1 h and 2 h
    // plus a CENSORED 0 h tail (last event == horizon)
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, 2L, ts("2024-01-01 01:00:00"), 1.0),
      (1L, 3L, ts("2024-01-01 03:00:00"), 1.0))
      .toDF("user_id", "event_id", "ts", "value")
    val got = EventAnalytics.kaplanMeier(ev).collect()
      .map(r => r.getAs[Long]("t") ->
        (r.getAs[Long]("d"), r.getAs[Long]("n_at_risk"),
          r.getAs[Double]("survival"))).toMap
    // t=0: the censored tail leaves the risk set without an event
    assert(got(0L) == (0L, 3L, 1.0))
    assert(got(1L) == (1L, 2L, 0.5))
    // last at-risk subject dies → survival exactly 0, not exp-tiny
    assert(got(2L) == (1L, 1L, 0.0))
  }

  test("E163: equal values have Gini 0; concentration follows the " +
    "exact cents rank formula") {
    val ev = Seq(
      (1L, "a", 1.0), (2L, "a", 1.0), (3L, "a", 1.0), (4L, "a", 1.0),
      (5L, "b", 0.01), (6L, "b", 0.01), (7L, "b", 0.01),
      (8L, "b", 100.0))
      .toDF("event_id", "event_type", "value")
    val got = graft.ext.DataProfile.giniConcentration(ev).collect()
      .map(r => r.getAs[String]("event_type") ->
        r.getAs[Double]("gini")).toMap
    assert(got("a") == 0.0)
    // cents 1,1,1,10000: wsum = 1+2+3+4·10000, tot = 10003, n = 4
    val want = Rounding.duckRoundDouble(
      2.0 * 40006 / (4.0 * 10003) - 5.0 / 4, 6)
    assert(got("b") == want)
  }

  test("E164: HHI of a 1-vs-3 doc split is 0.625") {
    val docs = Seq((1L, "s1", 10L), (2L, "s2", 10L), (3L, "s2", 10L),
      (4L, "s2", 10L)).toDF("doc_id", "source", "n_chars")
    val r = graft.ext.DataProfile.hhiSources(docs).collect()
    assert(r.length == 1 && r(0).getAs[Long]("n_sources") == 2L)
    assert(r(0).getAs[Double]("hhi_docs") == 0.625)
    assert(r(0).getAs[Double]("hhi_chars") == 0.625)
  }

  test("E165: one-type keys score zero entropy; a uniform mix " +
    "scores evenness 1") {
    val ev = Seq(
      (1L, "a"), (1L, "a"), (1L, "a"),        // bot: one endpoint
      (2L, "a"), (2L, "b"), (2L, "c"), (2L, "d")) // uniform over 4
      .toDF("user_id", "event_type")
    val got = EventAnalytics.behaviorEntropy(ev).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Double]("entropy"), r.getAs[Double]("evenness")))
      .toMap
    assert(got(1L) == (0.0, 0.0))
    val h4 = Rounding.duckRoundDouble(math.log(4.0), 6)
    assert(got(2L)._1 == h4)
    assert(got(2L)._2 == Rounding.duckRoundDouble(h4 /
      Rounding.duckRoundDouble(math.log(4.0), 6), 6))
  }

  test("E166: an independent contingency table has zero mutual " +
    "information") {
    // 2 types × 2 days, equal counts — exactly independent
    val ev = Seq(
      ("a", ts("2024-01-01 10:00:00")), ("a", ts("2024-01-02 10:00:00")),
      ("b", ts("2024-01-01 11:00:00")), ("b", ts("2024-01-02 11:00:00")))
      .toDF("event_type", "ts")
    val r = graft.ext.DataProfile
      .mutualInformation(ev, "event_type", "ts").collect()
    assert(r.length == 1)
    assert(r(0).getAs[Double]("mutual_information") == 0.0)
    assert(r(0).getAs[Long]("n_cells") == 4L)
  }

  test("E167: the reconciliation ledger counts matched and " +
    "one-sided keys exactly") {
    val l = Seq(1L, 1L, 2L, 3L).toDF("k") // duplicates collapse
    val r = Seq(2L, 3L, 4L).toDF("k")
    val row = graft.ext.DataProfile.reconcileKeys(l, r).collect()(0)
    assert(row.getAs[Long]("n_matched") == 2L)
    assert(row.getAs[Long]("n_left_only") == 1L)
    assert(row.getAs[Long]("n_right_only") == 1L)
    assert(row.getAs[Double]("match_rate") == 0.5)
  }

  test("E168: the backtest joins day-7 (not row-7) and scores exact " +
    "cent errors") {
    // type a: Mondays 10.00 then 14.00 (err 4.00), Tuesdays 20.00
    // then 20.00 (err 0) → MAE 2.0, WAPE 4/34; a missing day in
    // week 2 must NOT shift predictions (day-keyed join)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a", 10.0), // Mon w1
      (2L, ts("2024-01-02 10:00:00"), "a", 20.0), // Tue w1
      (3L, ts("2024-01-03 10:00:00"), "a", 7.0),  // Wed w1 (no pair)
      (4L, ts("2024-01-08 10:00:00"), "a", 14.0), // Mon w2
      (5L, ts("2024-01-09 10:00:00"), "a", 20.0)) // Tue w2
      .toDF("event_id", "ts", "event_type", "value")
    val r = EventAnalytics.seasonalNaiveBacktest(ev).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_days") == 2L)
    assert(r(0).getAs[Double]("mae") == 2.0)
    assert(r(0).getAs[Double]("wape") ==
      Rounding.duckRoundDouble(400.0 / 3400.0, 6))
  }

  test("E169: a constant series bootstraps to a zero-width interval; " +
    "resamples are deterministic") {
    val ev = (1 to 10).map(i => (i.toLong, "a", 5.0))
      .toDF("event_id", "event_type", "value")
    val r1 = graft.ext.DataProfile.bootstrapCI(ev).collect()
    assert(r1.length == 1)
    assert(r1(0).getAs[Double]("mean_value") == 5.0)
    assert(r1(0).getAs[Double]("ci_lo") == 5.0)
    assert(r1(0).getAs[Double]("ci_hi") == 5.0)
    assert(r1(0).getAs[Long]("n_resamples") == 32L)
    // derived randomness: a second run draws the identical resamples
    val r2 = graft.ext.DataProfile.bootstrapCI(ev).collect()
    assert(r1(0) == r2(0))
  }

  test("E170: the Hill estimator recovers the planted log-spacing") {
    // top-2 over threshold 1.0: values e², e → ln-sum 3 → α = 2/3
    val ev = Seq(
      (1L, "a", math.exp(2.0)), (2L, "a", math.exp(1.0)),
      (3L, "a", 1.0), (4L, "a", 0.5))
      .toDF("event_id", "event_type", "value")
    val r = graft.ext.DataProfile.hillTail(ev, k = 2).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Double]("xmin") == 1.0)
    assert(r(0).getAs[Double]("alpha_hat") ==
      Rounding.duckRoundDouble(2.0 / 3.0, 6))
  }

  test("E171: a deterministic 2-cycle stays at the uniform steady " +
    "state") {
    val ev = (1 to 8).map(i =>
      (1L, i.toLong, ts(f"2024-01-01 10:0$i:00"),
        if (i % 2 == 1) "A" else "B"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = EventAnalytics.markovSteadyState(ev).collect()
      .map(r => r.getAs[String]("state") ->
        r.getAs[Double]("steady_p")).toMap
    assert(got == Map("A" -> 0.5, "B" -> 0.5))
  }

  test("E172: small quasi-identifier cells flag at-risk; large ones " +
    "pass") {
    // type a: 30 rows → deciles of 3 (pass at k=2); type b: 10 rows
    // → deciles of 1 (at risk)
    val ev = ((1 to 30).map(i =>
      (i.toLong, ts("2024-01-01 10:00:00"), "a", i.toDouble)) ++
      (31 to 40).map(i =>
        (i.toLong, ts("2024-01-01 10:00:00"), "b", i.toDouble)))
      .toDF("event_id", "ts", "event_type", "value")
    val got = graft.ext.DataProfile.kAnonymity(ev, k = 2).collect()
    val byType = got.groupBy(_.getAs[String]("event_type"))
    assert(byType("a").forall(!_.getAs[Boolean]("at_risk")))
    assert(byType("b").forall(_.getAs[Boolean]("at_risk")))
  }

  test("E130: symmetric data has zero skew; moments follow the " +
    "round-before-use chain") {
    val ev = Seq((1L, "a", 100.0), (2L, "a", 200.0), (3L, "a", 300.0))
      .toDF("event_id", "event_type", "value")
    val r = graft.ext.DataProfile
      .momentStats(ev, "event_type", "value").collect()
    assert(r.length == 1 && r(0).getAs[Long]("n") == 3L)
    assert(r(0).getAs[Double]("mean") == 200.0)
    assert(r(0).getAs[Double]("skewness") == 0.0)
    // replicate the rounded-moment chain: m2 = m4 = round(2/3, 6)
    val m2 = Rounding.duckRoundDouble(2.0 / 3, 6)
    assert(r(0).getAs[Double]("stddev_pop") ==
      Rounding.duckRoundDouble(math.sqrt(m2) * 100, 6))
    assert(r(0).getAs[Double]("kurtosis_excess") ==
      Rounding.duckRoundDouble(m2 / (m2 * m2) - 3.0, 6))
  }
}
