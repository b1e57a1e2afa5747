package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-containment (range) join — a join category the reference
  * lacks entirely (SURVEY §2.4: no theta/range joins in pandas land):
  * classify each probe row into the band whose [lo, hi) interval
  * contains its value.
  *
  * Physical shape: the band table is broadcast and the containment
  * predicate evaluates as a BroadcastNestedLoopJoin — the RIGHT topology
  * for a small interval dimension (a non-equi join with a non-broadcast
  * side would degenerate to a shuffled cartesian product). Probe-side
  * work is O(|probe| · |bands|) comparisons, embarrassingly parallel,
  * no shuffle of the probe side at all.
  *
  * For a LARGE band table (thousands+ of intervals) the scalable rewrite
  * is bin-and-equi-join: assign each probe row floor(v / cell) and
  * explode each band into the cells it overlaps, then equi-join on the
  * cell and re-check containment — turning the nested loop into a hash
  * join. Not implemented here: the engine's band dimensions are
  * catalog-sized, and the broadcast plan is optimal for them.
  */
object RangeJoin {

  /** Left-join `probe` to the band containing `probe[v]`; bands carry
    * (band_id, lo, hi) with [lo, hi) semantics. Overlapping bands would
    * multiply probe rows (ordinary join semantics) — keep them disjoint
    * for classification use. */
  def bandJoin(probe: DataFrame, bands: DataFrame, v: String): DataFrame =
    probe.join(broadcast(bands),
      col(v) >= col("lo") && col(v) < col("hi"), "left")
}
