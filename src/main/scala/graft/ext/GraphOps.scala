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

  /** Bipartite projection with a hot-key cap: project (left, right)
    * memberships onto right-right edges weighted by shared-left count,
    * keeping edges with at least `minShared` common neighbors. The
    * projection's failure mode at scale is the hot LEFT key (a
    * customer touching k suppliers expands to k² pairs — the shingle
    * df-blowup in graph form), so left keys with degree > `maxDeg`
    * are dropped BEFORE the self-join, bounding per-key join work at
    * maxDeg² — the same cap-defines-the-semantics contract as
    * [[Dedup.cappedShingleHashes]] (the oracle mirrors the cap). */
  def bipartiteProjection(pairs: DataFrame, minShared: Long,
                          maxDeg: Long = 1000L): DataFrame = {
    val deg = pairs.groupBy(col("c")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") <= maxDeg).select(col("c"))
    val capped = pairs.join(deg, Seq("c"), "left_semi")
    capped.as("a").join(capped.as("b"),
        col("a.c") === col("b.c") && col("a.sp") < col("b.sp"))
      .groupBy(col("a.sp").as("node_a"), col("b.sp").as("node_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Per-node triangle participation over an UNDIRECTED edge list
    * given as canonical (node_a < node_b) rows: enumerate each
    * triangle once via the ordered 3-way equi-join
    * (a<b, b<c, a<c — the standard compact-forward algorithm; at
    * scale, ordering by degree first bounds the join fan-out), then
    * credit each corner. Output (node, n_triangles). */
  def triangleParticipation(edges: DataFrame): DataFrame = {
    val e = edges.select(col("node_a"), col("node_b"))
    val tris = e.as("e1")
      .join(e.as("e2"), col("e1.node_b") === col("e2.node_a"))
      .join(e.as("e3"),
        col("e3.node_a") === col("e1.node_a") &&
          col("e3.node_b") === col("e2.node_b"))
      .select(col("e1.node_a").as("a"), col("e1.node_b").as("b"),
        col("e2.node_b").as("c"))
    tris.select(explode(array(col("a"), col("b"), col("c")))
        .as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
  }

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
