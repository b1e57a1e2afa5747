package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-stream analytics for usage/engagement curation: ordered funnel
  * conversion and cohort retention. Both are classic warehouse questions
  * a training-data pipeline asks of its telemetry (which users convert,
  * how long sources stay active) and both are shaped for scale: every
  * stage keys on `user_id`, so the per-user aggregates and the
  * stage-to-stage joins share one hash partitioning — AQE coalesces the
  * exchanges instead of re-shuffling per stage, and nothing ever sorts
  * or windows over the full corpus.
  */
object EventAnalytics {

  /** Ordered three-step funnel (view → click → purchase): per user, the
    * first `view`, the first `click` at-or-after that view, and the
    * first `purchase` at-or-after that click. Users with no view are
    * excluded; later steps are NULL when never reached — the row shape
    * downstream conversion reports aggregate. Each step is a per-user
    * min-aggregate over a filtered scan joined back on `user_id`; the
    * dependency between steps (click must follow THIS user's first
    * view) is a co-partitioned equi-join, not a window over all events.
    */
  def funnel(events: DataFrame): DataFrame = {
    val v = events.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("view_ts"))
    val c = events.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("ts") >= col("view_ts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("click_ts"))
    val p = events.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("ts") >= col("click_ts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("purchase_ts"))
    v.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("view_ts"), col("click_ts"),
        col("purchase_ts"))
  }

  /** Cohort retention: users are cohorted by the calendar day of their
    * first event; `n_users` counts the distinct users of each cohort
    * active again `day_offset` days later (0 = the cohort day itself),
    * capped at `maxOffset`. The (user, day) activity set is de-duplicated
    * BEFORE the cohort join, so the join input is bounded by
    * users × days, not by raw event volume — the property that keeps
    * this a small-side pipeline at 100 TB of events. */
  def retention(events: DataFrame, maxOffset: Int = 7): DataFrame = {
    val cohort = events.groupBy(col("user_id"))
      .agg(date_trunc("DAY", min(col("ts"))).as("cohort_day"))
    val active = events
      .select(col("user_id"), date_trunc("DAY", col("ts")).as("day"))
      .distinct()
    active.join(cohort, Seq("user_id"))
      .withColumn("day_offset",
        datediff(col("day"), col("cohort_day")))
      .filter(col("day_offset") <= maxOffset)
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count_distinct(col("user_id")).as("n_users"))
  }

  /** Rolling N-day active users (the WAU/MAU family): for each calendar
    * day up to the data's last day, the count of distinct users active
    * in the trailing `window` days. Days whose trailing window contains
    * NO active user are OMITTED, not emitted as 0 — the output domain
    * is days reachable from some activity row, so an activity gap
    * longer than the window leaves a hole in the calendar (densify
    * against a generated day spine if a complete calendar is needed;
    * the oracle mirrors the same sparse shape). Windowed COUNT DISTINCT
    * does not
    * compose as a window function, so each (user, day) activity row is
    * exploded to the `window` as-of days it contributes to and the
    * count runs as a plain distinct aggregate per as-of day — the
    * explode multiplies the DEDUPED users × days frame (bounded), never
    * raw event volume, which is what keeps the rollup viable at 100 TB
    * of events. */
  def rollingActiveUsers(events: DataFrame,
                         window: Int = 7): DataFrame = {
    val active = events
      .select(col("user_id"), date_trunc("DAY", col("ts")).as("day"))
      .distinct()
    val maxDay = events
      .agg(date_trunc("DAY", max(col("ts"))).as("max_day"))
    active
      .withColumn("o", explode(sequence(lit(0), lit(window - 1))))
      .withColumn("as_of_day", expr("timestampadd(DAY, o, day)"))
      .crossJoin(broadcast(maxDay))
      .filter(col("as_of_day") <= col("max_day"))
      .groupBy(col("as_of_day"))
      .agg(count_distinct(col("user_id")).as("wau"))
  }

  /** Per-(event_type, day) volume and value, with a 3-day trailing mean
    * of the daily value sum — the ingestion-drift dashboard the batch
    * side keeps next to the streaming profile (e33). The rolling window
    * runs over the AGGREGATED daily frame (types × days rows, thousands
    * at most), never the raw events; the daily sum is rounded before
    * the window on both engines so the trailing mean sees identical
    * inputs. */
  def dailyTypeStats(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .groupBy(col("event_type"),
        date_trunc("DAY", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"),
        graft.Rounding.duckRound(sum(col("value")), 6).as("sum_value"))
    daily.withColumn("sum_value_3d",
      graft.Rounding.duckRound(avg(col("sum_value")).over(
        Window.partitionBy(col("event_type")).orderBy(col("day"))
          .rowsBetween(-2, 0)), 6))
  }

  /** Multi-level OLAP rollup over (event_type, day): leaf cells,
    * per-type subtotals, and the grand total in ONE pass —
    * `ROLLUP(event_type, day)` with `grouping_id()` tagging the level
    * (0 = leaf, 1 = type subtotal, 3 = grand total; first rollup column
    * is the high bit on both engines). Spark expands grouping sets
    * map-side and partial-aggregates before the single shuffle, so the
    * three levels cost one exchange of (types × days + types + 1)
    * groups, not three scans — the property that makes the cube viable
    * over 100 TB of raw events. Values are rounded AFTER the aggregate
    * (order-dependent double sums, the standard oracle contract). */
  def rollupStats(events: DataFrame): DataFrame =
    events.withColumn("day", date_trunc("DAY", col("ts")))
      .rollup(col("event_type"), col("day"))
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_events"),
        graft.Rounding.duckRound(sum(col("value")), 6).as("sum_value"))
      .select(col("event_type"), col("day"), col("gid"),
        col("n_events"), col("sum_value"))

  /** Day × event-type count matrix (pivot): one row per day, one LONG
    * column per type. The type domain is passed EXPLICITLY, which is
    * what keeps this scale-shaped: Spark's pivot without values runs a
    * driver-side distinct job first, and an unbounded domain would make
    * the row width data-dependent — both wrong for a 100 TB scan. With
    * the domain pinned this is ONE partial-aggregated groupBy (cells
    * combine map-side), and absent cells backfill 0 to match the
    * warehouse contract (`count(*) FILTER (...)` semantics). */
  def typeMatrix(events: DataFrame,
                 types: Seq[String]): DataFrame =
    events.groupBy(date_trunc("DAY", col("ts")).as("day"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)

  /** Exponentially weighted moving average of `value` per user in
    * (ts, event_id) order — pandas `ewm(alpha, adjust=True).mean()`
    * semantics: y_i = Σ_{j≤i} (1−α)^{i−j}·x_j / Σ_{j≤i} (1−α)^{i−j},
    * the smoother behind EWMA volatility / trend features. Computed
    * CLOSED-FORM as a ratio of two running sums with weights
    * r^{−j} (r = 1−α): the (1−α)^i rescale cancels in the ratio, so
    * no per-row renormalization pass is needed. Both running sums
    * accumulate in rank order inside an ordered window frame —
    * deterministic fp arithmetic, identical cross-engine.
    *
    * Scale shape: one per-user window (users are the parallel unit;
    * nothing sorts the corpus). The r^{−j} weight grows geometrically
    * with the per-key sequence length — fine for bounded per-key
    * histories (66 events/user here ⇒ ~10³ at α=0.1); kilometre-long
    * keys need the segmented/rescaled scan instead (documented, not
    * needed at this key cardinality). */
  def ewma(events: DataFrame, alpha: Double = 0.1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, 0)
    val j = (row_number().over(w) - 1).cast("double")
    val wgt = pow(lit(1.0 / (1.0 - alpha)), j)
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("num", sum(col("value") * wgt).over(run))
      .withColumn("den", sum(wgt).over(run))
      .select(col("user_id"), col("event_id"), col("ts"),
        graft.Rounding.duckRound(col("num") / col("den"), 6)
          .as("ewma_value"))
  }

  /** Robust per-group outlier flags via median absolute deviation:
    * |x − median| > k·MAD, the screen that survives the heavy tails
    * that wreck z-scores. Both medians are interpolated percentiles
    * over the AGGREGATED group (two tiny aggregates broadcast back);
    * the flag is one codegen'd comparison per row. */
  def madOutliers(events: DataFrame, k: Double = 3.0): DataFrame = {
    val med = events.groupBy(col("event_type"))
      .agg(graft.Rounding.duckRound(expr("percentile(value, 0.5)"), 6)
        .as("med"))
    val mad = events.join(broadcast(med), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(expr("percentile(abs(value - med), 0.5)").as("mad"),
        first(col("med")).as("med"))
    // the flag compares against the ROUNDED stats (the e36 quantile
    // contract: interpolated percentiles round before use, so a
    // last-ulp interpolation diff can never flip a boundary row)
    events.join(broadcast(mad), Seq("event_type"))
      .withColumn("med", graft.Rounding.duckRound(col("med"), 6))
      .withColumn("mad", graft.Rounding.duckRound(col("mad"), 6))
      .select(col("event_id"), col("event_type"), col("value"),
        col("med"), col("mad"),
        (abs(col("value") - col("med")) >
          lit(k) * col("mad")).as("is_outlier"))
  }

  /** Bollinger bands per key: trailing `window`-row mean ± k·sample-
    * stddev of `value` in (ts, event_id) order, plus the breach flag —
    * the classic volatility envelope (the FX reference's spike filter
    * is the crude form of this screen). Rows whose trailing frame
    * holds fewer than 2 samples carry NULL bands and a NULL breach on
    * both engines (sample stddev is undefined at n=1). Stats round
    * before the breach comparison, the e36 contract — Welford
    * accumulation order differs across engines, so the rounded stats
    * are the shared truth. One window per key; keys are the parallel
    * unit. */
  def bollingerBands(events: DataFrame, window: Int = 20,
                     k: Double = 2.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-(window - 1), 0)
    val mid = graft.Rounding.duckRound(avg(col("value")).over(w), 6)
    // Spark yields NaN for a 1-sample stddev where SQL engines yield
    // NULL — normalize to the SQL contract before the bands
    val sd = graft.Rounding.duckRound(
      nanvl(stddev_samp(col("value")).over(w),
        lit(null).cast("double")), 6)
    events
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("mid", mid)
      .withColumn("sd", sd)
      .withColumn("hi",
        graft.Rounding.duckRound(col("mid") + lit(k) * col("sd"), 6))
      .withColumn("lo",
        graft.Rounding.duckRound(col("mid") - lit(k) * col("sd"), 6))
      // no nullable booleans at the gate surface: an undefined band
      // cannot be breached
      .withColumn("breach",
        coalesce(col("value") > col("hi") || col("value") < col("lo"),
          lit(false)))
  }

  /** Quiet-gap throttle (lag-form debounce): keep an event only if at
    * least `gapSeconds` passed since the PREVIOUS event of the same
    * user (first events always kept) — the rapid-fire suppressor for
    * bot bursts / double-clicks / sensor chatter. The lag form is
    * windowable (one per-user window, no sequential state); the
    * keep-anchored variant ("since the last KEPT event") is the
    * stateful cousin — a StreamingEwma-style GroupState fold, not a
    * window — chosen against here because the lag form is what SQL
    * engines and the oracle can express identically. Comparison runs
    * on microsecond integers (no calendar-second truncation
    * ambiguity). */
  def quietGapFilter(events: DataFrame,
                     gapSeconds: Long = 3600L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .filter(col("prev").isNull ||
        unix_micros(col("ts")) - unix_micros(col("prev")) >=
          gapSeconds * 1000000L)
      .drop("prev")
  }

  /** KEEP-ANCHORED debounce — the stateful cousin of
    * [[quietGapFilter]]: an event is kept iff at least `gapSeconds`
    * passed since the last KEPT event of the same user, so a steady
    * burst emits one event per gap window instead of suppressing
    * everything after the first lull. This is inherently a sequential
    * per-key fold (the decision for row i depends on which earlier
    * rows were KEPT — no window function expresses it), so it runs as
    * `groupByKey(user).flatMapGroups` with an in-group
    * (ts, event_id) sort: the typed per-key-imperative topology, used
    * exactly where Catalyst has no operator for the semantics. Keys
    * are the parallel unit; per-key memory is the key's own history
    * (bounded here; kilometre-long keys would take
    * repartition+sortWithinPartitions with an iterator fold instead
    * of the in-memory sort). The oracle walks the same fold as a
    * recursive CTE. */
  def anchoredDebounce(events: DataFrame,
                       gapSeconds: Long = 3600L): DataFrame = {
    val session = events.sparkSession
    import session.implicits._
    val gapMicros = gapSeconds * 1000000L
    def micros(t: java.sql.Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("ts"), col("value").cast("double"))
      .as[(Long, Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val sorted = it.toIndexedSeq.sortBy(e => (micros(e._3), e._2))
        var anchor = Long.MinValue
        sorted.iterator.filter { e =>
          val m = micros(e._3)
          val keep = anchor == Long.MinValue || m - anchor >= gapMicros
          if (keep) anchor = m
          keep
        }
      }
      .toDF("user_id", "event_id", "ts", "value")
  }

  /** Equi-depth feature binning: each row's n-tile bucket of `value`
    * within its event type — the discretization behind equi-depth
    * histograms, PSI drift inputs, and monotone feature encoding.
    * Standard SQL NTILE over the (value, event_id) total order (the
    * arrival-id tie-break keeps equal values deterministic), so both
    * engines agree bucket-for-bucket including the first-(n mod b)-
    * buckets-get-one-extra fill rule. One window per group key —
    * groups are the parallel unit; nothing sorts the corpus. */
  def equiDepthBins(events: DataFrame, n: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    events.select(col("event_id"), col("event_type"), col("value"))
      .withColumn("bin", ntile(n).over(w).cast("long"))
  }

  /** Slowly-changing-dimension (type 2) history of each user's
    * event-type "state": consecutive same-type runs collapse to one
    * validity interval `[valid_from, valid_to)`, the last interval per
    * user open-ended (`valid_to` NULL, `is_current` true) — the
    * dimension-table build every warehouse ETL ships. Gaps-and-islands
    * over a per-user window (change flag → running island id → one
    * groupBy), then `lead(valid_from)` closes each interval; every
    * stage keys on `user_id`, so the windows and the aggregate share
    * one hash partitioning and nothing ever sorts the full corpus —
    * per-user history is the natural parallel unit at 100 TB.
    * Total event order is (ts, event_id) — the arrival-id tie-break
    * that makes the window deterministic cross-engine. */
  def scd2History(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val flagged = events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(w).isNull ||
          lag(col("event_type"), 1).over(w) =!= col("event_type"), 1)
          .otherwise(0))
      .withColumn("island", sum(col("chg")).over(w))
    val islands = flagged
      .groupBy(col("user_id"), col("island"), col("event_type"))
      .agg(min(col("ts")).as("valid_from"), count(lit(1)).as("n_events"))
    val wi = Window.partitionBy(col("user_id")).orderBy(col("island"))
    islands
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wi))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col("user_id"), col("event_type"), col("valid_from"),
        col("valid_to"), col("n_events"), col("is_current"))
  }

  /** Per-key running-peak drawdown in (ts, event_id) order: the
    * running max is the high-water mark, `drawdown = (peak − value) /
    * peak` the fractional fall from it, and `max_drawdown` the CAUSAL
    * running max of the drawdowns — every row carries the worst fall
    * seen SO FAR, which is exactly what a stateful stream can emit
    * (the e125 replay folds the identical sequence; a whole-partition
    * max would not be causal). The risk metric behind equity-curve /
    * engagement-decline monitoring. All three columns are running
    * window aggregates over one per-key window — max is exact fp, the
    * ratio is the identical expression tree cross-engine, and the
    * rounded drawdowns make the final running max exact. Keys are the
    * parallel unit; values are strictly positive in this corpus (the
    * ratio form presumes a positive series — a signed series would
    * take the peak−value absolute form instead). */
  def maxDrawdown(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val run = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    events
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("peak", max(col("value")).over(run))
      .withColumn("drawdown", graft.Rounding.duckRound(
        (col("peak") - col("value")) / col("peak"), 6))
      .withColumn("max_drawdown", max(col("drawdown")).over(run))
  }

  /** Anchored VWAP per part: the running volume-weighted average price
    * Σ(price·qty)/Σ(qty) in shipdate order — the execution-quality
    * anchor every trading/pricing desk tracks, here over the order
    * book's line items. Money accumulates in FIXED POINT: prices are
    * exact cents and quantities integral, so both running sums are
    * int64 — overflow-safe (≤ 2^62 by corpus bounds) and EXACT, where
    * double accumulation differs at the last ulp across engines
    * (DuckDB's windowed sum trees its partials; Spark's runs
    * sequentially) and flips round-6 boundaries (~1 row in 10⁴,
    * measured). One final division of identical operands, one
    * rounding. One window per part key; parts are the parallel unit —
    * nothing sorts the corpus. */
  def anchoredVwap(lineitem: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val run = Window.partitionBy(col("l_partkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cents = round(col("l_extendedprice") * lit(100)).cast("bigint")
    val qty = col("l_quantity").cast("bigint")
    lineitem
      .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate"), cents.as("_cents"), qty.as("_qty"))
      .withColumn("vwap", graft.Rounding.duckRound(
        sum(col("_cents") * col("_qty")).over(run).cast("double") /
          (sum(col("_qty")).over(run) * lit(100L)).cast("double"), 6))
      .drop("_cents", "_qty")
  }

  /** Per-group least-squares trend of `value` against time (days since
    * the corpus start): slope, intercept, and R² from population
    * co-moments — drift detection for telemetry ("is error volume
    * trending up?"). The co-moments (avg, covar_pop, var_pop) are the
    * only order-dependent sums, so they round to 6 before ANY use (the
    * e36 contract) and every derived quantity is then the identical
    * expression tree cross-engine — slope = cov/var, intercept =
    * ȳ − slope·x̄, R² = cov²/(varₓ·var_y). One partial-aggregated
    * groupBy; the single-row min(ts) anchor broadcasts. */
  def trendRegression(events: DataFrame): DataFrame = {
    val t0 = events.agg(min(col("ts")).as("t0"))
    val xd = (unix_micros(col("ts")).cast("double") -
      unix_micros(col("t0")).cast("double")) /
      lit(86400000000L).cast("double")
    val a = events.join(broadcast(t0))
      .select(col("event_type"), xd.as("xd"), col("value").as("y"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.Rounding.duckRound(avg(col("xd")), 6).as("mx"),
        graft.Rounding.duckRound(avg(col("y")), 6).as("my"),
        graft.Rounding.duckRound(covar_pop(col("y"), col("xd")), 6)
          .as("cxy"),
        graft.Rounding.duckRound(var_pop(col("xd")), 6).as("vx"),
        graft.Rounding.duckRound(var_pop(col("y")), 6).as("vy"))
    a.select(col("event_type"), col("n"),
      graft.Rounding.duckRound(col("cxy") / col("vx"), 6).as("slope"),
      graft.Rounding.duckRound(
        col("my") - (col("cxy") / col("vx")) * col("mx"), 6)
        .as("intercept"),
      graft.Rounding.duckRound(
        (col("cxy") * col("cxy")) / (col("vx") * col("vy")), 6)
        .as("r2"))
  }

  /** First-order Markov transition matrix of the per-user event-type
    * sequence: P(next | prev) with counts — the session-behavior model
    * behind next-action prediction and bot-pattern screens. A per-user
    * lag gives each event its predecessor (order (ts, event_id), the
    * deterministic tie-break), then one partial-aggregated groupBy
    * counts transitions; the row-normalizing denominator is a window
    * over the 25-row transition table, not the corpus. Integer counts
    * divide exactly the same on both engines. */
  def markovTransitions(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val t = events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    t.withColumn("p", graft.Rounding.duckRound(
      col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("prev_type")))
          .cast("double"), 6))
  }

  /** Top-k event-type TRIGRAMS across per-user sequences — the
    * sequence-mining complement of [[markovTransitions]]' first-order
    * matrix: a 3-step pattern (browse→cart→purchase vs
    * browse→cart→abandon) is invisible to pairwise transitions. One
    * per-user window produces both leads in a single pass; counts
    * partial-aggregate on the (t1,t2,t3) key (cardinality ≤ |types|³,
    * never event-sized), and the top-k is TakeOrderedAndProject with
    * a full tie-break. */
  def eventTrigrams(events: DataFrame, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("t1"),
        lead(col("event_type"), 1).over(w).as("t2"),
        lead(col("event_type"), 2).over(w).as("t3"))
      .filter(col("t3").isNotNull)
      .groupBy(col("t1"), col("t2"), col("t3"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("t1"), col("t2"), col("t3"))
      .limit(k)
  }

  /** Per-group autocorrelation at lags 1–3: Pearson corr of the series
    * with its own lagged copy in (ts, event_id) order — the
    * seasonality/momentum screen (white noise ⇒ ~0 at every lag).
    * Lags come from one per-group window; corr skips the NULL
    * leading pairs identically on both engines and rounds to 6 (corr
    * is an order-dependent co-moment, the e36 contract). Group keys
    * are the parallel unit — with few huge groups the series would
    * first aggregate to a bounded per-minute grid (the candle-frame
    * pattern) before windowing. */
  def acf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("event_type"), col("ts"), col("event_id"),
        col("value"))
      .withColumn("l1", lag(col("value"), 1).over(w))
      .withColumn("l2", lag(col("value"), 2).over(w))
      .withColumn("l3", lag(col("value"), 3).over(w))
      .groupBy(col("event_type"))
      .agg(
        graft.Rounding.duckRound(corr(col("value"), col("l1")), 6)
          .as("acf1"),
        graft.Rounding.duckRound(corr(col("value"), col("l2")), 6)
          .as("acf2"),
        graft.Rounding.duckRound(corr(col("value"), col("l3")), 6)
          .as("acf3"))
  }

  /** Daily realized volatility per key: Σ (ln(vᵢ/vᵢ₋₁))² of the
    * within-day consecutive ratios in (ts, event_id) order — the
    * high-frequency variance estimator (sum of squared log returns)
    * every FX desk aggregates tick streams into. Returns reset at the
    * day boundary BY partitioning the lag on (key, day): no
    * cross-midnight ratio exists, so days are independent — which is
    * also what makes the operator embarrassingly parallel (a
    * (key, day) pair never spans partitions; the DayWindows rationale).
    * The ln ratio is one identical expression tree; only the
    * order-dependent sum of squares rounds. */
  def realizedVolatility(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), col("ts"),
        col("value"), to_date(col("ts")).as("day"))
      .withColumn("prev", lag(col("value"), 1).over(w))
      .filter(col("prev").isNotNull)
      .withColumn("lr", log(col("value") / col("prev")))
      // DATE surfaces as TIMESTAMP at the gate (the date_trunc rule:
      // DATE dtypes don't compare across engines)
      .groupBy(col("user_id"), col("day").cast("timestamp").as("day"))
      .agg(count(lit(1)).as("n_ret"),
        graft.Rounding.duckRound(sum(col("lr") * col("lr")), 6)
          .as("rv"))
  }

  /** Daily time-weighted average per key: each value holds until the
    * NEXT event of the same (key, day) — piecewise-constant TWAP, the
    * duration-honest average (a price quoted for 6 hours weighs 360×
    * one quoted for a minute; the plain mean treats them equally).
    * The last event of a day has no successor and carries no weight.
    * Weights accumulate in FIXED POINT — int64 cents × int64
    * microsecond durations (≤ 2^58 by corpus bounds) — the e119
    * contract: exact where double products at ~10¹⁵ magnitudes put
    * the round-6 grain below the accumulation ulp. One lead window
    * per (key, day); pairs never span partitions. */
  def twap(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), col("ts"),
        to_date(col("ts")).as("day"),
        round(col("value") * lit(100)).cast("bigint").as("cents"))
      .withColumn("dt",
        lead(unix_micros(col("ts")), 1).over(w) -
          unix_micros(col("ts")))
      .filter(col("dt").isNotNull)
      .groupBy(col("user_id"), col("day").cast("timestamp").as("day"))
      .agg(count(lit(1)).as("n_seg"),
        graft.Rounding.duckRound(
          sum(col("cents") * col("dt")).cast("double") /
            (sum(col("dt")) * lit(100L)).cast("double"), 6).as("twap"))
  }

  /** Last-touch attribution: each purchase credits the most recent
    * PRECEDING marketing touch (view/click) of the same user within
    * `windowDays`, else 'direct' — the revenue-accounting join every
    * growth team runs. The touch carries forward via
    * `last(·, ignoreNulls)` over a per-user causal frame (one window,
    * no self-join, no pair expansion — the naive "join purchases to
    * all prior touches then argmax" is quadratic in bursty keys);
    * the freshness test runs on microsecond integers. */
  def lastTouchAttribution(events: DataFrame,
                           windowDays: Int = 7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val isTouch = col("event_type").isin("view", "click")
    val carried = events
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"))
      .withColumn("t_id", when(isTouch, col("event_id")))
      .withColumn("t_type", when(isTouch, col("event_type")))
      .withColumn("t_us", when(isTouch, unix_micros(col("ts"))))
      .withColumn("touch_id", last(col("t_id"), true).over(w))
      .withColumn("touch_type0", last(col("t_type"), true).over(w))
      .withColumn("touch_us", last(col("t_us"), true).over(w))
    val fresh = col("touch_us").isNotNull &&
      (unix_micros(col("ts")) - col("touch_us") <=
        lit(windowDays.toLong * 86400L * 1000000L))
    carried.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"),
        when(fresh, col("touch_type0")).otherwise(lit("direct"))
          .as("touch_type"),
        when(fresh, col("touch_id")).as("touch_event_id"))
  }

  /** Probability-integral (CDF) transform per group: each value maps
    * to its empirical cumulative rank r/n within its event type — the
    * calibration-friendly normalization (uniform marginals by
    * construction) behind copula features and rank-based blending.
    * The (value, event_id) tie-break makes every row its own peer
    * class, so cume_dist is exactly rank/n on both engines — one
    * identical integer division, no distribution assumptions. One
    * window per group; groups are the parallel unit. */
  def cdfTransform(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    events.select(col("event_id"), col("event_type"), col("value"))
      .withColumn("cdf", graft.Rounding.duckRound(
        cume_dist().over(Window.partitionBy(col("event_type"))
          .orderBy(col("value"), col("event_id"))), 6))
  }

  /** CUBE of the order-book flags: all four grouping sets of
    * (returnflag, linestatus) in one pass — the every-margin
    * companion of [[rollupStats]]'s hierarchy (ROLLUP drills a
    * hierarchy; CUBE crosses independent dimensions). Same
    * grouping_id contract: first column = high bit on both engines;
    * Spark plans one Expand + one partial-aggregated shuffle, never
    * 4 scans. */
  def cubeStats(lineitem: DataFrame): DataFrame =
    lineitem.cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_items"),
        graft.Rounding.duckRound(sum(col("l_quantity")), 6)
          .as("sum_qty"))
      .select(col("l_returnflag"), col("l_linestatus"), col("gid"),
        col("n_items"), col("sum_qty"))

  /** Trailing point-in-time features for every purchase: event count,
    * view count, click count, and average value over the key's OWN
    * preceding 24 hours — the leakage-safe feature vector a training
    * pipeline joins to its labels (each row sees only its own past;
    * the e137 PIT join is the dimension-side twin of this
    * fact-side windowing). One RANGE frame per key on microsecond
    * integers; value aggregates ride the e119 fixed-point contract
    * (int64 cents — a RANGE frame is re-aggregated per row, exactly
    * where engines tree their double partials differently). */
  def trailingFeatures(events: DataFrame,
                       windowHours: Long = 24L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-windowHours * 3600L * 1000000L, 0)
    events
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"),
        round(col("value") * lit(100)).cast("bigint").as("cents"),
        unix_micros(col("ts")).as("us"))
      // all four aggregates in ONE projection: chained withColumns
      // interleave Projects that block CollapseWindow, planning a
      // Window node per aggregate instead of one shared pass
      // (PlanShapeSpec pins the collapsed shape)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"),
        count(lit(1)).over(w).as("n_events_24h"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L))
          .over(w).as("n_view_24h"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .over(w).as("n_click_24h"),
        sum(col("cents")).over(w).as("sum_cents"))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"),
        col("n_events_24h"), col("n_view_24h"), col("n_click_24h"),
        graft.Rounding.duckRound(
          col("sum_cents").cast("double") /
            (col("n_events_24h") * lit(100L)).cast("double"), 6)
          .as("avg_value_24h"))
  }

  /** Half-life-decayed trending scores: each line item contributes
    * 0.5^(age/halfLife) toward its supplier, so "trending" means
    * recent volume, not lifetime volume — the freshness-weighted
    * leaderboard behind trending-content / hot-SKU surfaces. The
    * anchor (max shipdate) is a 1-row broadcast; the decay weight is
    * one identical expression tree; only the order-dependent weight
    * sum rounds, and the rank runs on the ROUNDED score with a key
    * tie-break (the e60 deterministic-rank contract) over the
    * AGGREGATED supplier table — bounded by the dimension's
    * cardinality, never by line-item volume. */
  def decayTrending(lineitem: DataFrame, halfLifeDays: Double = 7.0,
                    k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mx = lineitem.agg(max(unix_micros(col("l_shipdate")))
      .as("mts"))
    val wgt = pow(lit(0.5),
      (col("mts").cast("double") -
        unix_micros(col("l_shipdate")).cast("double")) /
        lit(86400000000L).cast("double") / lit(halfLifeDays))
    lineitem.join(broadcast(mx))
      .select(col("l_suppkey"), wgt.as("wgt"))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_items"),
        graft.Rounding.duckRound(sum(col("wgt")), 6).as("score"))
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("score").desc, col("l_suppkey")))
        .cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Latest-wins state snapshot: each key's most recent event (by the
    * (ts, event_id) total order) — the denormalized current-state
    * table every serving layer keeps next to the event log. One
    * per-key window, rank-1 filter; Spark plans the per-key limit
    * without ranking whole histories. */
  def latestState(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    events
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"), col("value"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("ts").as("last_ts"), col("event_type").as("last_type"),
        col("value").as("last_value"))
  }

  /** Weekly lifecycle matrix: per calendar week, how many active
    * users are new (first week ever), retained (also active the
    * previous week), or resurrected (active before, absent last
    * week) — plus how many of the previous week's actives churned
    * into this week. The growth-accounting decomposition
    * (active = new + retained + resurrected; churn balances the
    * ledger). Everything is presence-set algebra on (user, week)
    * rows: one distinct, one min-aggregate, two self-joins shifted
    * by exactly 7 days (calendar weeks make the shift a constant
    * interval) — all keyed on user, so the joins co-partition; no
    * window ever sees the raw event volume. */
  def churnMatrix(events: DataFrame): DataFrame = {
    val p = events.select(col("user_id"),
      date_trunc("week", col("ts")).cast("timestamp").as("wk"))
      .distinct()
    val firstWk = p.groupBy(col("user_id"))
      .agg(min(col("wk")).as("first_wk"))
    val prev = p.select(col("user_id"),
      (col("wk") + expr("INTERVAL 7 DAY")).as("wk"),
      lit(1).as("was_prev"))
    val cur = p.join(firstWk, Seq("user_id"))
      .join(prev, Seq("user_id", "wk"), "left")
      .select(col("wk"), (col("wk") === col("first_wk")).as("is_new"),
        col("was_prev").isNotNull.as("was_prev"))
    val agg = cur.groupBy(col("wk"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("is_new"), 1L).otherwise(0L)).as("n_new"),
        sum(when(col("was_prev"), 1L).otherwise(0L)).as("n_retained"),
        sum(when(!col("is_new") && !col("was_prev"), 1L)
          .otherwise(0L)).as("n_resurrected"))
    val churn = p.as("a")
      .join(p.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("b.wk") === col("a.wk") + expr("INTERVAL 7 DAY"),
        "left_anti")
      .groupBy((col("wk") + expr("INTERVAL 7 DAY")).as("wk"))
      .agg(count(lit(1)).as("n_churned"))
    agg.join(churn, Seq("wk"), "left")
      .select(col("wk"), col("n_active"), col("n_new"),
        col("n_retained"), col("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned_in"))
  }

  /** Steady-state distribution of the e122 Markov chain by power
    * iteration: π' = πP from uniform, each round ONE co-partitioned
    * join + one partial-aggregated groupBy over the (k², bounded)
    * transition table, entries ROUNDED at every round boundary so
    * the fixed-round chain is deterministic cross-engine (the oracle
    * unrolls the identical rounds; this chain converges exactly by
    * round 11). The long-run behavioral mix — what the one-step
    * matrix (e122) only implies. */
  def markovSteadyState(events: DataFrame,
                        rounds: Int = 12): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val cnt = events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    val p = CachePins.pinCheckpoint(cnt.withColumn("p",
      col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("prev_type")))
          .cast("double")))
    val states = p.select(col("prev_type").as("s")).distinct()
    val kk = states.agg(count(lit(1)).as("k"))
    var pi = CachePins.pinCheckpoint(
      states.join(broadcast(kk))
        .select(col("s"),
          (lit(1.0) / col("k").cast("double")).as("pi")))
    for (_ <- 1 to rounds) {
      pi = CachePins.pinCheckpoint(
        pi.join(p, pi("s") === p("prev_type"))
          .groupBy(col("next_type").as("s"))
          .agg(graft.Rounding.duckRound(sum(col("pi") * col("p")), 6)
            .as("pi")))
    }
    pi.select(col("s").as("state"), col("pi").as("steady_p"))
  }

  /** Seasonal-naive forecast backtest: predict each day's total
    * value per group by the SAME WEEKDAY one week earlier, score
    * with MAE and WAPE — the baseline every forecasting system must
    * beat, and the backtest harness shape (train window → holdout →
    * error metric) that grades it. The prediction is a day-keyed
    * co-partitioned self-join (dayord − 7), NOT a row lag — robust
    * to missing days. Daily totals and absolute errors accumulate in
    * int64 CENTS (exact, the e119 contract); the error ratios are
    * one identical division each. */
  def seasonalNaiveBacktest(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("event_type"),
        expr("unix_micros(ts) DIV 86400000000").as("dayord"),
        round(col("value") * lit(100)).cast("bigint").as("c"))
      .groupBy(col("event_type"), col("dayord"))
      .agg(sum(col("c")).as("cents"))
    val pred = daily.select(col("event_type"),
      (col("dayord") + 7).as("dayord"), col("cents").as("pred"))
    daily.join(pred, Seq("event_type", "dayord"))
      .select(col("event_type"),
        abs(col("cents") - col("pred")).as("abs_err_cents"),
        col("cents"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        graft.Rounding.duckRound(
          sum(col("abs_err_cents")).cast("double") /
            (count(lit(1)) * lit(100L)).cast("double"), 6).as("mae"),
        graft.Rounding.duckRound(
          sum(col("abs_err_cents")).cast("double") /
            sum(col("cents")).cast("double"), 6).as("wape"))
  }

  /** Per-key behavioral entropy: Shannon H = −Σ p·ln p over the
    * key's event-type mix, plus evenness H/ln(k) — the
    * scripted-vs-organic screen (a bot hammering one endpoint scores
    * near 0; a human mixing all five types near 1). Exact integer
    * counts; the ln ratios are identical trees; the evenness
    * denominator ROUNDS before the division (e36). Two
    * partial-aggregated groupBys, keys the parallel unit. */
  def behaviorEntropy(events: DataFrame): DataFrame = {
    val c = events.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val tot = c.groupBy(col("user_id"))
      .agg(sum(col("n")).as("nt"), count(lit(1)).as("n_types"))
    val p = col("n").cast("double") / col("nt").cast("double")
    val h = c.join(tot, Seq("user_id"))
      .groupBy(col("user_id"))
      .agg(graft.Rounding.duckRound(-sum(p * log(p)), 6)
        .as("entropy"),
        first(col("n_types")).as("n_types"),
        first(col("nt")).as("n_events"))
    h.select(col("user_id"), col("n_events"), col("n_types"),
      col("entropy"),
      when(col("n_types") === 1, lit(0.0))
        .otherwise(graft.Rounding.duckRound(
          col("entropy") / graft.Rounding.duckRound(
            log(col("n_types").cast("double")), 6), 6))
        .as("evenness"))
  }

  /** Kaplan-Meier survival of inter-event waiting times: how long
    * until a key's NEXT event, with the final open gap (last event →
    * corpus horizon) correctly treated as CENSORED — the estimator
    * that makes recurrence analysis honest (dropping open gaps
    * biases toward short waits; counting them as events biases the
    * tail). Durations are integer hours via one per-key lead;
    * the risk-set walk and the product-limit curve are windows over
    * the AGGREGATED duration table (cardinality = distinct
    * durations, horizon-bounded — 79 rows here, never event volume).
    * The product is exp(Σ ln(1 − d/n)) of EXACT integer ratios —
    * identical trees cross-engine — with the terminal
    * zero-survivors factor guarded (S drops to exactly 0 once the
    * risk set empties). */
  def kaplanMeier(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wKey = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val horizon = events.agg(max(unix_micros(col("ts"))).as("hus"))
    val obs = events
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("ts"), col("event_id"))
      .withColumn("next_us", lead(col("us"), 1).over(wKey))
      .join(broadcast(horizon))
      .select(
        when(col("next_us").isNotNull,
          expr("(next_us - us) DIV 3600000000"))
          .otherwise(expr("(hus - us) DIV 3600000000")).as("t"),
        when(col("next_us").isNotNull, 1L).otherwise(0L).as("died"))
    val n0 = obs.agg(count(lit(1)).as("n0"))
    val ev = obs.groupBy(col("t"))
      .agg(sum(col("died")).as("d"), count(lit(1)).as("leaving"))
    val wPrev = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val risk = ev.join(broadcast(n0))
      .withColumn("n_at_risk",
        col("n0") - coalesce(sum(col("leaving")).over(wPrev),
          lit(0L)))
    val lnTerm = when(col("n_at_risk") > col("d"),
      log((col("n_at_risk") - col("d")).cast("double") /
        col("n_at_risk").cast("double"))).otherwise(lit(0.0))
    val zeroSeen = max(when(col("n_at_risk") === col("d") &&
      col("d") > 0, 1).otherwise(0)).over(wRun)
    risk.select(col("t"), col("d"), col("n_at_risk"),
      when(zeroSeen === 1, lit(0.0))
        .otherwise(graft.Rounding.duckRound(
          exp(sum(lnTerm).over(wRun)), 6)).as("survival"))
  }

  /** Two-proportion z-test between experiment arms (user_id parity
    * split): per-arm conversion (here: ≥ `minPurchases` purchases),
    * the pooled-rate z statistic, and the |z| > 1.96 verdict — the
    * A/B readout every growth experiment ends with. All counts are
    * exact integers from one partial-aggregated per-user pass +
    * one 1-row arm aggregate; rates and the pooled rate round BEFORE
    * the z algebra and the verdict compares the ROUNDED z (e36 —
    * a last-ulp difference can never flip significance). */
  def abZTest(events: DataFrame,
              minPurchases: Long = 15L): DataFrame = {
    val arms = events.groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase", 1L)
        .otherwise(0L)).as("np"))
      .select((col("user_id") % 2).as("arm"),
        when(col("np") >= minPurchases, 1L).otherwise(0L)
          .as("converted"))
    val s = arms.agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === 0, col("converted")).otherwise(0L))
        .as("conv_a"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("arm") === 1, col("converted")).otherwise(0L))
        .as("conv_b"))
    val r = s.select(col("n_a"), col("conv_a"), col("n_b"),
      col("conv_b"),
      graft.Rounding.duckRound(
        col("conv_a").cast("double") / col("n_a").cast("double"), 6)
        .as("rate_a"),
      graft.Rounding.duckRound(
        col("conv_b").cast("double") / col("n_b").cast("double"), 6)
        .as("rate_b"),
      graft.Rounding.duckRound(
        (col("conv_a") + col("conv_b")).cast("double") /
          (col("n_a") + col("n_b")).cast("double"), 6).as("pooled"))
    val z = graft.Rounding.duckRound(
      (col("rate_a") - col("rate_b")) /
        sqrt(col("pooled") * (lit(1.0) - col("pooled")) *
          (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 6)
    r.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      col("rate_a"), col("rate_b"), z.as("z"),
      (abs(z) > lit(1.96)).as("significant"))
  }

  /** Per-key activity coverage: active days, calendar span, their
    * ratio, and the longest inactivity gap — the data-completeness
    * profile that tells a churned key from a sparsely-sampled one
    * before any per-key model trains on it. Day ordinals are integer
    * epoch-day arithmetic; one distinct, one per-key lag over the
    * (bounded) day set, one partial-aggregated groupBy. */
  def activityCoverage(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("dayord"))
    events
      .select(col("user_id"),
        expr("unix_micros(ts) DIV 86400000000").as("dayord"))
      .distinct()
      .withColumn("gap", col("dayord") - lag(col("dayord"), 1).over(w))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("active_days"),
        (max(col("dayord")) - min(col("dayord")) + 1)
          .as("span_days"),
        graft.Rounding.duckRound(
          count(lit(1)).cast("double") /
            (max(col("dayord")) - min(col("dayord")) + 1)
              .cast("double"), 6).as("coverage"),
        coalesce(max(col("gap")) - 1, lit(0L)).cast("bigint")
          .as("longest_gap_days"))
  }

  /** Roll's effective-spread estimator per key: 2·√(−cov(Δpₜ,
    * Δpₜ₋₁)) — the classic microstructure trick that reads the
    * bid-ask bounce out of trade prices alone (no quote data needed):
    * bounce makes successive price changes negatively autocovariant,
    * and the magnitude IS the spread. Clamped at zero covariance
    * (positive autocovariance ⇒ estimator undefined ⇒ 0, the
    * standard convention). Two lags in one per-key window, one
    * partial-aggregated covariance per key, rounded before the
    * derived √ (e36). */
  def rollSpread(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("value"))
      .withColumn("dp", col("value") - lag(col("value"), 1).over(w))
      .withColumn("dp_prev",
        lag(col("value"), 1).over(w) - lag(col("value"), 2).over(w))
      .filter(col("dp").isNotNull && col("dp_prev").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        graft.Rounding.duckRound(
          covar_pop(col("dp"), col("dp_prev")), 6).as("cov_dp"))
      .select(col("user_id"), col("n_pairs"), col("cov_dp"),
        graft.Rounding.duckRound(
          lit(2.0) * sqrt(greatest(lit(0.0).cast("double"),
            -col("cov_dp"))), 6).as("roll_spread"))
  }

  /** Lo-MacKinlay variance ratio per group: VR(q) = var(q-step
    * differences) / (q · var(1-step differences)) — the
    * random-walk test (VR ≈ 1 for a random walk, < 1 for
    * mean-reversion; this corpus measures ≈ 0.25, i.e. i.i.d. noise
    * around a level, exactly what q·var additivity predicts for an
    * uncorrelated series). Two lags in one per-group window, two
    * rounded population variances, one identical division. */
  def varianceRatio(events: DataFrame, q: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("event_type"), col("ts"), col("event_id"),
        col("value"))
      .withColumn("d1", col("value") - lag(col("value"), 1).over(w))
      .withColumn("dq", col("value") - lag(col("value"), q).over(w))
      .groupBy(col("event_type"))
      .agg(graft.Rounding.duckRound(var_pop(col("d1")), 6).as("v1"),
        graft.Rounding.duckRound(var_pop(col("dq")), 6).as(s"v$q"))
      .select(col("event_type"), col("v1"), col(s"v$q"),
        graft.Rounding.duckRound(
          col(s"v$q") / (lit(q.toDouble) * col("v1")), 6)
          .as(s"vr$q"))
  }

  /** Two-sided CUSUM change detection per key (Page): the sequential
    * fold s⁺ₜ = max(0, s⁺ₜ₋₁ + devₜ − slack), s⁻ₜ = max(0, s⁻ₜ₋₁ −
    * devₜ − slack) over scaled deviations from the GLOBAL mean, with
    * an alarm when either side crosses `h` — the classic drift
    * detector that fires on small sustained shifts a threshold test
    * misses. Inherently a per-key sequential fold (the max(0,·) reset
    * depends on the whole prefix — no window expresses it), so like
    * [[anchoredDebounce]] it runs as typed `groupByKey.flatMapGroups`
    * with an in-group (ts, event_id) sort; keys are the parallel
    * unit. The fold is plain double arithmetic in one fixed order on
    * both engines (the oracle walks it as a recursive CTE), so the
    * emitted statistics are bit-identical — rounding happens only at
    * the output surface. The reference mean is one broadcast-scale
    * scalar, rounded before use (e36). */
  def cusum(events: DataFrame, slack: Double = 0.05,
            h: Double = 1.0): DataFrame = {
    val session = events.sparkSession
    import session.implicits._
    val meanS = graft.Rounding.duckRoundDouble(
      events.agg(avg(col("value") / lit(100.0))).head().getDouble(0), 6)
    def micros(t: java.sql.Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("ts"), col("value").cast("double"))
      .as[(Long, Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val sorted = it.toIndexedSeq.sortBy(e => (micros(e._3), e._2))
        var sp = 0.0
        var sn = 0.0
        sorted.iterator.map { e =>
          val dev = e._4 / 100.0 - meanS
          sp = math.max(0.0, sp + dev - slack)
          sn = math.max(0.0, sn - dev - slack)
          (e._1, e._2, e._3,
            graft.Rounding.duckRoundDouble(sp, 6),
            graft.Rounding.duckRoundDouble(sn, 6),
            sp > h || sn > h)
        }
      }
      .toDF("user_id", "event_id", "ts", "s_pos", "s_neg", "alarm")
  }
}
