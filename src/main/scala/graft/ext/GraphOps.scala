package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge lists — the Pregel-shaped
  * workloads (PageRank here; connected components live in
  * [[Clustering]]) a curation pipeline runs over its derived graphs:
  * doc-similarity graphs, user-interaction graphs, source-link graphs.
  *
  * Scale shape: each iteration is ONE co-partitioned equi-join
  * (edges ⋈ ranks on src, both hash-partitioned on the same key across
  * iterations, so AQE reuses the exchange) plus ONE aggregation shuffle
  * on dst — the classic message-passing round. Iteration count is a
  * fixed small constant (power iteration converges geometrically at
  * rate = damping), NOT data-dependent; per-round frames
  * localCheckpoint-truncate ([[CachePins.pinCheckpoint]]) so the plan
  * stays one node deep instead of growing by two joins per round — the
  * same lineage rule the delta-dedup loop established (SCALE.md r11).
  * Nothing ever collects: rank state lives distributed, keyed by node.
  */
object GraphOps {

  /** Power-iteration PageRank over a DIRECTED edge list (src, dst) —
    * callers model an undirected graph by passing both directions.
    * Every node must appear as a src (true for symmetrized edges);
    * dangling mass is therefore zero and each round is exactly
    * r' = (1−d)/n + d·Σ_in r/outdeg.
    *
    * Returns (node, rank) after `iters` rounds, ranks unrounded
    * (callers round for oracle comparison). The only driver-side values
    * are the node count (one scalar) — rank vectors never leave the
    * cluster. */
  def pageRank(edges: DataFrame, iters: Int = 5,
               damping: Double = 0.85): DataFrame = {
    // outdeg joins once against the edge list, then the pair
    // (src, dst, outdeg) is the loop-invariant message topology —
    // checkpointed so every iteration reads a one-node frame
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val topo = CachePins.pinCheckpoint(edges.join(deg, Seq("src")))
    val nodes = CachePins.pinCheckpoint(
      edges.select(col("src").as("node")).distinct())
    val n = nodes.count().toDouble
    var ranks = nodes.withColumn("rank", lit(1.0) / lit(n))
    for (_ <- 1 to iters) {
      val contribs = topo
        .join(ranks, topo("src") === ranks("node"))
        .groupBy(col("dst"))
        .agg(sum(col("rank") / col("outdeg")).as("c"))
      ranks = CachePins.pinCheckpoint(
        nodes.join(contribs, nodes("node") === contribs("dst"), "left")
          .select(col("node"),
            (lit(1.0 - damping) / lit(n) +
              lit(damping) * coalesce(col("c"), lit(0.0))).as("rank")))
    }
    ranks
  }
}
