package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops._

/** Driver contract — one named query per implemented operator from
  * SURVEY.md §2 (see COVERAGE.md for the §2-id → query-name map), each with
  * a DuckDB oracle twin in [[oracleSql]].
  *
  * Convention: floating-point results that involve accumulation-order-
  * dependent arithmetic (sums/averages/medians) are rounded to 6 decimals
  * on BOTH sides so the driver's hash compare is robust to last-ulp
  * differences between Spark's partial-aggregate tree and DuckDB's
  * single-node order. Values produced by identical scalar expression trees
  * (projections, min/max) are bit-identical and need no rounding.
  */
object SparkEntry {

  /** The canonical tick frame (Tables.ticks) as a DuckDB CTE. */
  private val ticksCte =
    """ticks AS (
      |  SELECT ts AS datetime, event_id AS tick_id,
      |         value + (CAST(0.01 AS DOUBLE)
      |                  + (event_id % 10) * CAST(0.001 AS DOUBLE)) / 2 AS ask,
      |         value - (CAST(0.01 AS DOUBLE)
      |                  + (event_id % 10) * CAST(0.001 AS DOUBLE)) / 2 AS bid
      |  FROM events)""".stripMargin

  /** TickPrep (F1+F2+P6/P7) as a DuckDB CTE chained after [[ticksCte]].
    * DuckDB dayofweek is Sun=0..Sat=6 (Spark: Sun=1..Sat=7). */
  private val preppedCte =
    """prepped AS (
      |  SELECT *, (ask + bid) / 2 AS mid, ask - bid AS spread
      |  FROM ticks
      |  WHERE NOT (ask < 0.0001 OR bid < 0.0001)
      |    AND NOT (dayofweek(datetime) = 6
      |          OR (dayofweek(datetime) = 5 AND hour(datetime) >= 22)
      |          OR (dayofweek(datetime) = 0 AND hour(datetime) < 21)))""".stripMargin

  /** OHLC candle select-list over a prepped tick relation (G1–G3). */
  private def ohlcSelectSql(extraKey: String = ""): String = {
    val key = if (extraKey.isEmpty) "" else s"$extraKey, "
    s"""SELECT ${key}date_trunc('minute', datetime) AS datetime,
       |  round(first(mid ORDER BY datetime, tick_id), 6) AS open,
       |  round(max(mid), 6) AS high,
       |  round(min(mid), 6) AS low,
       |  round(last(mid ORDER BY datetime, tick_id), 6) AS close,
       |  count(mid) AS volume,
       |  round(avg(spread), 6) AS spread
       |FROM prepped
       |GROUP BY ${if (extraKey.isEmpty) "1" else "1, 2"}""".stripMargin
  }

  private def roundedOhlc(candles: DataFrame, keyCols: Seq[String]): DataFrame = {
    val sel = keyCols.map(col) ++ Seq(
      col("datetime"),
      round(col("open"), 6).as("open"), round(col("high"), 6).as("high"),
      round(col("low"), 6).as("low"), round(col("close"), 6).as("close"),
      col("volume"), round(col("spread"), 6).as("spread"))
    candles.select(sel: _*)
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("g1_g2_g3_ohlc_resample")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // S2: schema'd scan + column pruning + filter pushdown
    "s2_scan_prune" -> ((s, dir) =>
      Tables.load(s, dir, "events")
        .select(col("event_id"), col("ts"), col("value"))
        .filter(col("value") >= 0.0001)),

    // P1: two-field string → timestamp parse (reference format)
    "p1_parse_timestamp" -> ((s, dir) =>
      Tables.load(s, dir, "events").select(
        col("event_id"),
        to_timestamp(
          date_format(col("ts"), "yyyy.MM.dd HH:mm:ss"),
          "yyyy.MM.dd HH:mm:ss").as("parsed"))),

    // P6+P7: mid price and spread derivation
    "p6_p7_mid_spread" -> ((s, dir) =>
      TickPrep.deriveMidSpread(Tables.ticks(s, dir)).select(
        col("tick_id"), col("datetime"),
        round(col("mid"), 6).as("mid"),
        round(col("spread"), 6).as("spread"))),

    // P13: date-part extraction (the dayofweek numbering trap)
    "p13_date_parts" -> ((s, dir) =>
      Tables.load(s, dir, "events").select(
        col("event_id"),
        dayofweek(col("ts")).as("dow_sun1"),
        weekday(col("ts")).as("dow_mon0"),
        hour(col("ts")).as("hr"))),

    // F1: bad-tick (zero/garbage quote) filter
    "f1_bad_tick_filter" -> ((s, dir) =>
      TickPrep.badTickFilter(Tables.ticks(s, dir))
        .select(col("tick_id"), col("ask"), col("bid"))),

    // F2: FX weekend/market-closure filter
    "f2_weekend_filter" -> ((s, dir) =>
      TickPrep.weekendFilter(Tables.ticks(s, dir))
        .select(col("tick_id"), col("datetime"))),

    // F4: dropna on close
    "f4_dropna_close" -> ((s, dir) =>
      Tables.load(s, dir, "events")
        .select(col("event_id"),
          when(col("event_type") === "error", lit(null))
            .otherwise(col("value")).as("close"))
        .filter(col("close").isNotNull)),

    // G1+G2+G3: the flagship 1-minute OHLC+spread+tick-volume resample
    "g1_g2_g3_ohlc_resample" -> ((s, dir) =>
      roundedOhlc(Resample.ohlc1min(TickPrep(Tables.ticks(s, dir))), Nil)),

    // G1 keyed variant: per-user (symbol-style) OHLC — the scale shape
    "g1_ohlc_by_key" -> ((s, dir) => {
      val ticks = Tables.load(s, dir, "events").select(
        col("ts").as("datetime"), col("event_id").as("tick_id"),
        col("user_id"), col("value").as("mid"),
        lit(null).cast("double").as("spread"))
      roundedOhlc(Resample.ohlc1min(ticks, Seq("user_id")), Seq("user_id"))
        .drop("spread")
    }),

    // G5: exact median as grouped aggregate
    "g5_median_spread" -> ((s, dir) =>
      TickPrep.deriveMidSpread(Tables.ticks(s, dir))
        .groupBy()
        .agg(round(percentile(col("spread"), lit(0.5)), 6)
          .as("median_spread"))),

    // G6: count-style reductions
    "g6_count_reductions" -> ((s, dir) =>
      Tables.load(s, dir, "events").agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("user_id")).as("n_users"),
        count(when(col("value") < 1.0, 1)).as("n_small"))),

    // O2: deterministic top-k (TakeOrderedAndProject)
    "o2_top5_offenders" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
          col("l_linenumber"))
        .limit(5)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice")))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(

    "s2_scan_prune" ->
      "SELECT event_id, ts, value FROM events WHERE value >= 0.0001",

    "p1_parse_timestamp" ->
      ("SELECT event_id, strptime(strftime(ts, '%Y.%m.%d %H:%M:%S'), " +
        "'%Y.%m.%d %H:%M:%S') AS parsed FROM events"),

    "p6_p7_mid_spread" ->
      s"""WITH $ticksCte
         |SELECT tick_id, datetime,
         |  round((ask + bid) / 2, 6) AS mid,
         |  round(ask - bid, 6) AS spread
         |FROM ticks""".stripMargin,

    "p13_date_parts" ->
      ("SELECT event_id, dayofweek(ts) + 1 AS dow_sun1, " +
        "isodow(ts) - 1 AS dow_mon0, hour(ts) AS hr FROM events"),

    "f1_bad_tick_filter" ->
      s"""WITH $ticksCte
         |SELECT tick_id, ask, bid FROM ticks
         |WHERE NOT (ask < 0.0001 OR bid < 0.0001)""".stripMargin,

    "f2_weekend_filter" ->
      s"""WITH $ticksCte
         |SELECT tick_id, datetime FROM ticks
         |WHERE NOT (dayofweek(datetime) = 6
         |        OR (dayofweek(datetime) = 5 AND hour(datetime) >= 22)
         |        OR (dayofweek(datetime) = 0 AND hour(datetime) < 21))""".stripMargin,

    "f4_dropna_close" ->
      ("SELECT event_id, CASE WHEN event_type = 'error' THEN NULL " +
        "ELSE value END AS close FROM events " +
        "WHERE NOT event_type = 'error'"),

    "g1_g2_g3_ohlc_resample" ->
      s"""WITH $ticksCte, $preppedCte
         |${ohlcSelectSql()}""".stripMargin,

    "g1_ohlc_by_key" ->
      """WITH prepped AS (
        |  SELECT ts AS datetime, event_id AS tick_id, user_id,
        |         value AS mid FROM events)
        |SELECT user_id, date_trunc('minute', datetime) AS datetime,
        |  round(first(mid ORDER BY datetime, tick_id), 6) AS open,
        |  round(max(mid), 6) AS high,
        |  round(min(mid), 6) AS low,
        |  round(last(mid ORDER BY datetime, tick_id), 6) AS close,
        |  count(mid) AS volume
        |FROM prepped GROUP BY 1, 2""".stripMargin,

    "g5_median_spread" ->
      s"""WITH $ticksCte
         |SELECT round(median(ask - bid), 6) AS median_spread FROM ticks""".stripMargin,

    "g6_count_reductions" ->
      ("SELECT count(*) AS n_rows, count(DISTINCT user_id) AS n_users, " +
        "count(CASE WHEN value < 1.0 THEN 1 END) AS n_small FROM events"),

    "o2_top5_offenders" ->
      ("SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem " +
        "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 5")
  )
}
