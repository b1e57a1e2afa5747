package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Day-partitioned backends for the global-time-order windows (W1–W5,
  * P10) — the scale escape hatch promised in SCALE.md for single-key
  * candle frames.
  *
  * A Spark window with no partition keys collapses to ONE task
  * (`hybrid_merger.py`'s implicit global DatetimeIndex order). That is
  * bounded-safe for a minute-candle frame (rows scale with the time span,
  * not tick volume) but it is still the engine's only serial stage. Each
  * operator here computes the SAME result in two partition-parallel
  * steps:
  *
  *   1. the window runs inside `date_trunc('day', …)` partitions
  *      (1440 candle rows/day — thousands of parallel tasks on a year);
  *   2. a per-day "patch" table — ONE row per present day, built with an
  *      ordinary aggregation — carries state across day boundaries and is
  *      broadcast-joined back.
  *
  * The cross-day carry itself is a sorted prior-row window over the
  * patch table (`last(_, ignoreNulls)` up to the previous day). That
  * window IS single-task, but its input is the O(days) patch table —
  * one row per present day, ~5.5k rows for 15 years — bounded by the
  * calendar span, never by data volume, so it is scale-safe for any
  * realistic span (and O(days·log days), unlike an as-of self-join's
  * O(days²) pair space). The serial stage this object removes is the
  * one over the FULL frame.
  *
  * KEYED composition (`keys` parameter, VERDICT r7 #5): every operator
  * optionally takes a key prefix (e.g. `symbol`). The within-day
  * windows partition by (keys :+ day) and the patch-table carry
  * partitions by `keys` — so a keyed run day-parallelizes INSIDE each
  * key as well. A plain keyed window already parallelizes across keys,
  * but one dominant key (the FX reality: one major pair carrying most
  * of the volume) still serializes that key's whole 15-year frame into
  * one task; with the day backend the dominant key's serial stage is
  * its O(days) patch table, and the carry window — now partitioned by
  * key — is no longer even single-task across keys. Contract
  * unchanged: exact equality with the corresponding [[WindowOps]]
  * helper partitioned by `keys` (DayWindowsSpec, and oracle-checked
  * via the `*_day_part` driver queries).
  *
  * Contract: `orderBy` columns must uniquely identify a row WITHIN a
  * key (the candle frames' `datetime` is unique per key).
  */
object DayWindows {

  private val Day = "_dw_day"

  /** The patch-side join hint. The patch tables are O(keys × days)
    * rows (edge strips O(keys × days × 4)): for the bounded FX symbol
    * sets these operators compose over, that broadcasts safely (tens
    * of symbols × a 15-year calendar ≈ 10⁵ rows). The hint's assumed
    * bound is ~10⁷ patch rows (≲ the 8 GB broadcast-relation ceiling
    * at these row widths) — ADVICE r8: above that key cardinality ×
    * span, pass `broadcastPatch = false` and AQE picks the join
    * strategy from the patch table's runtime size instead. */
  private def patchSide(df: DataFrame, hint: Boolean): DataFrame =
    if (hint) broadcast(df) else df

  private def withDay(df: DataFrame, orderBy: Seq[String]): DataFrame =
    df.withColumn(Day, date_trunc("day", col(orderBy.head)))

  private def wDay(orderBy: Seq[String], keys: Seq[String]) =
    Window.partitionBy((keys :+ Day).map(col): _*)
      .orderBy(orderBy.map(col): _*)

  /** As-of carry over the day patch table: for every (key, day), each
    * pick's value at the LATEST prior day of the SAME key where it is
    * non-null (null when no such day). A sorted prior-row window over
    * the O(days) patch table: single-task per key by construction, but
    * bounded by the calendar span — one row per present (key, day) —
    * so the WindowExec warning it logs on the unkeyed form is a
    * bounded, deliberate cost (cf. [[rollingMedian5]]'s edge strip). */
  private def asofPriorDay(carries: DataFrame, keys: Seq[String],
                           picks: Seq[(String, String)]): DataFrame = {
    val wPrior = Window.partitionBy(keys.map(col): _*).orderBy(col(Day))
      .rowsBetween(Window.unboundedPreceding, -1)
    val outs = picks.map { case (src, out) =>
      last(col(src), ignoreNulls = true).over(wPrior).as(out)
    }
    carries.select(keys.map(col) ++ (col(Day) +: outs): _*)
  }

  /** W3/W4/W5 at scale: forward-fill `cols` in per-key global `orderBy`
    * order, executed day-parallel. Step 1 ffills within each (key,
    * day); step 2 takes each day's last non-null (an aggregate, not a
    * window), finds the latest prior day that has one (as-of join on
    * the tiny day table), and broadcasts it back as the carry-in for
    * rows not yet filled within their own day. */
  def ffill(df: DataFrame, cols: Seq[String],
            orderBy: Seq[String] = Seq("datetime"),
            keys: Seq[String] = Nil,
            broadcastPatch: Boolean = true): DataFrame = {
    val df2 = withDay(df, orderBy)
    val wIn = wDay(orderBy, keys)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withIn = cols.foldLeft(df2)((d, c) =>
      d.withColumn(s"_dw_f_$c", last(col(c), ignoreNulls = true).over(wIn)))
    // per-day carry = the within-day ffill at the day's LAST row (struct
    // max on the unique order key; v never decides the ordering)
    val ord = struct(orderBy.map(col): _*)
    val aggs = cols.map(c =>
      max(struct(ord.as("o"), col(s"_dw_f_$c").as("v"))).getField("v")
        .as(s"_dw_c_$c"))
    val carries = withIn.groupBy((keys :+ Day).map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val carryIn = asofPriorDay(carries, keys,
      cols.map(c => s"_dw_c_$c" -> s"_dw_in_$c"))
    val patched = withIn.join(patchSide(carryIn, broadcastPatch),
      keys :+ Day)
    cols.foldLeft(patched)((d, c) =>
        d.withColumn(c, coalesce(col(s"_dw_f_$c"), col(s"_dw_in_$c"))))
      .drop(Day)
      .drop(cols.flatMap(c => Seq(s"_dw_f_$c", s"_dw_in_$c")): _*)
  }

  /** W2/P10 at scale: previous-row value in per-key global `orderBy`
    * order, written to column `out`. Within-day lag everywhere except
    * each day's first row, which takes the same key's previous PRESENT
    * day's last value (exactly the per-key global previous row) from
    * the broadcast patch table. */
  def lag1(df: DataFrame, c: String, out: String,
           orderBy: Seq[String] = Seq("datetime"),
           keys: Seq[String] = Nil,
           broadcastPatch: Boolean = true): DataFrame = {
    val df2 = withDay(df, orderBy)
    val w = wDay(orderBy, keys)
    val ord = struct(orderBy.map(col): _*)
    // the day's last VALUE (may itself be null — the global lag takes it
    // as-is), so the as-of anchor is the day itself, not the value:
    // every present day has a last row, hence a non-null _dw_anchor
    val carries = df2.groupBy((keys :+ Day).map(col): _*).agg(
      max(struct(ord.as("o"), col(c).as("v"))).getField("v").as("_dw_lastv"),
      lit(1).as("_dw_anchor"))
    val carryIn = asofPriorDay(
      carries.withColumn("_dw_lastv",
        struct(col("_dw_anchor"), col("_dw_lastv"))),
      keys, Seq("_dw_lastv" -> "_dw_in"))
      .withColumn("_dw_in", col("_dw_in").getField("_dw_lastv"))
    df2.withColumn("_dw_rn", row_number().over(w))
      .withColumn("_dw_lag", lag(col(c), 1).over(w))
      .join(patchSide(carryIn, broadcastPatch), keys :+ Day)
      .withColumn(out,
        when(col("_dw_rn") === 1, col("_dw_in")).otherwise(col("_dw_lag")))
      .drop(Day, "_dw_rn", "_dw_lag", "_dw_in")
  }

  /** W1 at scale: centered rolling median (window 5, min_periods 1) in
    * per-key global `orderBy` order, written to column `out`.
    *
    * Interior rows (>2 from both day edges) get the (key,
    * day)-partitioned frame, which equals the per-key global frame.
    * Rows within 2 of a day edge have frames that cross the boundary;
    * they are recomputed exactly over the "edge strip" E = first/last
    * 4 rows of every day, ordered per key. For any such row, all 5
    * per-key frame rows lie in E: same-day frame rows are within 4 of
    * that day's edge, and any row within 2 per-key positions of a day
    * boundary is within the last/first 2 rows of its OWN day (the
    * positions between it and the boundary all belong to later/earlier
    * days). The frame rows are consecutive within the key, hence
    * adjacent inside E too, so the ±2 window over E is the exact
    * per-key global window.
    *
    * The E window is single-partition PER KEY (positional neighbors
    * can't be re-derived with an as-of join), but its input is O(8
    * rows/day per key) — bounded by the time span, not the data — so
    * the WindowExec warning it logs on the unkeyed form is a bounded,
    * deliberate cost. */
  def rollingMedian5(df: DataFrame, c: String, out: String,
                     orderBy: Seq[String] = Seq("datetime"),
                     keys: Seq[String] = Nil,
                     broadcastPatch: Boolean = true): DataFrame = {
    val df2 = withDay(df, orderBy)
    val asc = wDay(orderBy, keys)
    val desc = Window.partitionBy((keys :+ Day).map(col): _*)
      .orderBy(orderBy.map(o => col(o).desc): _*)
    val tagged = df2
      .withColumn("_dw_rn", row_number().over(asc))
      .withColumn("_dw_rrn", row_number().over(desc))
    val dayMed = WindowOps.median5FromSorted(
      sort_array(collect_list(col(c)).over(asc.rowsBetween(-2, 2))))
    val wE = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderBy.map(col): _*).rowsBetween(-2, 2)
    val eMed = tagged
      .filter(col("_dw_rn") <= 4 || col("_dw_rrn") <= 4)
      .withColumn("_dw_emed", WindowOps.median5FromSorted(
        sort_array(collect_list(col(c)).over(wE))))
      .filter(col("_dw_rn") <= 2 || col("_dw_rrn") <= 2)
      .select((keys ++ orderBy).map(col) :+ col("_dw_emed"): _*)
    tagged.withColumn(out, dayMed)
      .join(patchSide(eMed, broadcastPatch), keys ++ orderBy, "left")
      .withColumn(out,
        when(col("_dw_rn") <= 2 || col("_dw_rrn") <= 2, col("_dw_emed"))
          .otherwise(col(out)))
      .drop(Day, "_dw_rn", "_dw_rrn", "_dw_emed")
  }
}
