package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — the canonical time-series join Spark
  * lacks as a built-in. For each left row, attaches the right row with
  * the greatest `rightTime <= leftTime` within the same `keys` group
  * (inclusive, like DuckDB's `ASOF JOIN ... ON l.t >= r.t`); left rows
  * with no prior right row keep NULLs (left-join semantics).
  *
  * Not in the reference (SURVEY §2.4 notes as-of joins are absent) — an
  * engine extension for the feed-alignment workloads the reference's
  * exact-equi reindex (J1) cannot express.
  *
  * Implementation is the scalable union–sort–fill topology, not a pair
  * join: both sides are unioned with a side tag, partitioned by `keys`,
  * sorted by (time, side) so a right row at time T is visible to left
  * rows at the same T, and the right payload is forward-filled as ONE
  * struct (all attached columns always come from the SAME right row —
  * per-column fills could mix rows). Cost is O((|L|+|R|) log) per key
  * partition with a single shuffle on `keys`, no candidate-pair blowup,
  * and no driver-side data. With empty `keys` the sort degenerates to a
  * single-partition window (bounded inputs only; at scale, partition by
  * day and patch boundaries as in [[DayWindows]]).
  *
  * Contract: `right` must be unique per (`keys`, `rightTime`) — with
  * duplicates the surviving payload would depend on intra-window order
  * (DuckDB's ASOF leaves the same case undefined). Aggregate the right
  * side first (the natural shape: checkpoints, candles, rates).
  */
object AsofJoin {

  /** @param rightVals right columns to attach, emitted as `prefix+name`;
    *                   the matched right time is emitted as `prefix+ts`. */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String, rightVals: Seq[String],
           prefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns.toSeq
    val rp = struct(
      col(rightTime).as(s"${prefix}ts") +:
        rightVals.map(c => col(c).as(prefix + c)): _*)
    // NULL semantics match the SQL form (`l.t >= r.t AND l.k = r.k`):
    // a NULL right time or NULL right key never matches any left row.
    // Without this filter a NULL right time would sort FIRST in the
    // window and forward-fill as a bogus "match" for every left row,
    // and NULL keys would pair up in partitionBy (SQL equality never
    // matches NULL = NULL). Left rows with NULL keys/time still flow
    // through and get NULL attachments, as in a SQL left join.
    val rNonNull = (col(rightTime).isNotNull +: keys.map(col(_).isNotNull))
      .reduce(_ && _)
    val r = right.filter(rNonNull).select(
      keys.map(col) ++ Seq(col(rightTime).as("_at"),
        lit(0).as("_side"), rp.as("_rp")): _*)
    val l = left.select(
      keys.map(col) ++ Seq(col(leftTime).as("_at"),
        lit(1).as("_side"), struct(leftCols.map(col): _*).as("_lp")): _*)
    val u = l.withColumn("_rp", lit(null).cast(r.schema("_rp").dataType))
      .unionByName(
        r.withColumn("_lp", lit(null).cast(l.schema("_lp").dataType)))
    // right-before-left at equal time ⇒ inclusive match; a NULL left time
    // sorts first (no preceding right row) ⇒ NULL attach, matching
    // DuckDB's NULL >= t ⇒ no-match
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_at"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    u.withColumn("_rp", last(col("_rp"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(
        leftCols.map(c => col(s"_lp.$c").as(c)) ++
          (s"${prefix}ts" +: rightVals.map(prefix + _))
            .map(f => col(s"_rp.$f").as(f)): _*)
  }

  /** [[asof]] with a match tolerance (pandas `merge_asof(tolerance=…)`):
    * a prior right row further than `toleranceSec` behind the left time
    * does not count — all attached columns revert to NULL together (the
    * match is a row, never a per-column mix). The bound is applied in
    * integer MICROSECONDS after the join, so it costs one codegen'd
    * projection and is exact at timestamp precision — no change to the
    * union–sort–fill topology or its single shuffle. */
  def asofTolerance(left: DataFrame, right: DataFrame, keys: Seq[String],
                    leftTime: String, rightTime: String,
                    rightVals: Seq[String], toleranceSec: Long,
                    prefix: String = "asof_"): DataFrame = {
    val joined = asof(left, right, keys, leftTime, rightTime, rightVals,
      prefix)
    val within = col(s"${prefix}ts").isNotNull &&
      unix_micros(col(leftTime)) - unix_micros(col(s"${prefix}ts")) <=
        toleranceSec * 1000000L
    (s"${prefix}ts" +: rightVals.map(prefix + _)).foldLeft(joined) {
      case (df, c) => df.withColumn(c, when(within, col(c)))
    }
  }
}
