package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Consistent-hash ring assignment and the rebalancing scorecard —
  * the shard-topology decision behind every persisted store in this
  * engine (near-dup segments, the cell-partitioned ANN index, shard
  * exports): when capacity grows n → n+1, how much data moves?
  *
  * Modulo placement (`h % n`) remaps ~(1 − 1/(n+1)) of all keys — a
  * near-total reshuffle of a 100 TB store. A hash RING (each shard
  * owns the arcs before its virtual points; a key belongs to the
  * first point clockwise from its hash) remaps only the arcs the new
  * shard claims, ~1/(n+1). Both placements here are md5-derived and
  * the ring's point set is built from the SAME hash on both engines,
  * so the scorecard is oracle-exact, not a simulation.
  *
  * The ring lookup is a codegen'd literal-array expression
  * (`size(filter(points, p < h))` + wrap) — O(V·n) driver model state
  * broadcast as a literal, zero shuffle, the KMeans-centroids
  * contract. */
object ConsistentHash {

  /** Virtual points per shard. */
  val VNodes = 8

  /** Sorted ring for `n` shards: (positions, owning shard ids),
    * positions from the engine's md5Long of "ring|s<i>|<v>" — the
    * exact arithmetic the DuckDB twin reproduces. */
  def ring(n: Int): (Seq[Long], Seq[Int]) = {
    val pts = for { s <- 0 until n; v <- 0 until VNodes }
      yield (graft.functions.Md5Long64.hash60(
        s"ring|s$s|$v".getBytes("UTF-8")), s)
    val sorted = pts.sortBy(_._1)
    (sorted.map(_._1), sorted.map(_._2))
  }

  /** Owner of hash column `h` on the `n`-shard ring: first virtual
    * point at or after h, wrapping to the smallest point. */
  def ringOwner(n: Int, h: Column): Column = {
    val (ps, os) = ring(n)
    val pts = typedlit(ps)
    val owners = typedlit(os)
    val below = size(filter(pts, p => p < h))
    element_at(owners,
      when(below === ps.size, 1).otherwise(below + 1))
  }

  /** The n → n+1 rebalancing scorecard over `keys` (one string key
    * column named `k`): rows ('modulo' | 'ring', n_total, n_moved,
    * frac). */
  def rebalanceScore(keys: DataFrame, n: Int): DataFrame = {
    val h = Dedup.md5Long(col("k"))
    val withH = keys.select(h.as("h"))
    def row(scheme: String, moved: Column) =
      withH.agg(count(lit(1)).as("n_total"),
          sum(when(moved, 1L).otherwise(0L)).as("n_moved"))
        .select(lit(scheme).as("scheme"), col("n_total"),
          col("n_moved"),
          graft.Rounding.duckRound(col("n_moved").cast("double") /
            col("n_total"), 6).as("frac"))
    row("modulo", pmod(col("h"), lit(n.toLong)) =!=
        pmod(col("h"), lit(n.toLong + 1)))
      .unionByName(row("ring", ringOwner(n, col("h")) =!=
        ringOwner(n + 1, col("h"))))
  }
}
