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

  /** Synchronous label propagation (Raghavan et al. 2007) over a
    * SYMMETRIZED edge list for a FIXED round count: labels init to
    * the node id; each round every node adopts the SMALLEST among its
    * neighbors' most frequent labels ((max count, min label) — a
    * total order, so the rounds are deterministic on both engines,
    * unlike the randomized-order original). The round cap is
    * SEMANTIC, not a convergence shortcut: synchronous LPA can
    * 2-cycle on bipartite structure, so "the labeling after R
    * rounds" is the well-defined quantity (the e127/e180
    * oracle-parity convention).
    *
    * Scale shape: per round one co-partitioned join (edges ⋈ labels
    * on src) + two aggregations keyed by node — the pageRank
    * topology; label frames truncate lineage per round, the edge
    * frame checkpoints once. Output: (node, label, comm_size). */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    val topo = CachePins.pinCheckpoint(
      edges.select(col("src"), col("dst")))
    var labels = CachePins.pinCheckpoint(
      topo.select(col("src").as("node")).distinct()
        .select(col("node"), col("node").as("lbl")))
    for (_ <- 1 to rounds) {
      val counts = topo.join(labels, topo("src") === labels("node"))
        .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("c"))
      val mx = counts.groupBy(col("dst")).agg(max(col("c")).as("mc"))
      labels = CachePins.pinCheckpoint(
        counts.join(mx, Seq("dst"))
          .filter(col("c") === col("mc"))
          .groupBy(col("dst")).agg(min(col("lbl")).as("lbl"))
          .select(col("dst").as("node"), col("lbl")))
    }
    val sizes = labels.groupBy(col("lbl"))
      .agg(count(lit(1)).as("comm_size"))
    labels.join(sizes, Seq("lbl"))
      .select(col("node"), col("lbl").as("label"), col("comm_size"))
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

  /** K-core decomposition by iterative peeling over an UNDIRECTED
    * canonical (node_a < node_b) edge list: repeatedly drop nodes
    * whose degree among SURVIVORS is < k; what remains is the k-core —
    * the standard cohesion screen (spam rings, dense collaboration
    * cores) that a plain degree cut can't express, because removing a
    * weak node can demote its neighbors.
    *
    * Peels TO THE FIXPOINT (VERDICT r12 #2): the driver-side loop
    * stops when a round removes no node — alive counts are monotone
    * decreasing, so count equality IS set equality — with `maxRounds`
    * as the safety/oracle-parity cap (an unrolled-CTE oracle with N ≥
    * the graph's settling depth matches exactly, because rounds past
    * the fixpoint are no-ops; the co-purchase graph settles in 2).
    * The per-round count is free: [[CachePins.pinCheckpoint]] has
    * already materialized the frame, so counting it launches no new
    * work beyond a metadata scan. A fixed-round variant silently
    * under-converges on deep graphs (a 2k-node chain needs ~1k peels)
    * — the spec pins that failure mode. Each round is two
    * co-partitioned semi-joins (both edge endpoints must be alive) +
    * one partial-aggregated degree count — the message-passing
    * topology of [[pageRank]], with the same per-round
    * localCheckpoint lineage truncation. Returns (node, core_deg),
    * the in-core degree of each surviving node. */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 64): DataFrame = {
    val sym = CachePins.pinCheckpoint(
      edges.select(col("node_a").as("src"), col("node_b").as("dst"))
        .unionByName(
          edges.select(col("node_b").as("src"),
            col("node_a").as("dst"))))
    def aliveDeg(alive: DataFrame): DataFrame =
      sym.join(alive, sym("src") === alive("node"), "left_semi")
        .join(alive.withColumnRenamed("node", "dnode"),
          col("dst") === col("dnode"), "left_semi")
        .groupBy(col("src")).agg(count(lit(1)).as("deg"))
    var alive = CachePins.pinCheckpoint(
      sym.select(col("src").as("node")).distinct())
    var prev = alive.count()
    var round = 0
    var converged = prev == 0L
    while (!converged && round < maxRounds) {
      alive = CachePins.pinCheckpoint(
        aliveDeg(alive).filter(col("deg") >= k)
          .select(col("src").as("node")))
      val n = alive.count()
      converged = n == prev
      prev = n
      round += 1
    }
    aliveDeg(alive)
      .select(col("src").as("node"), col("deg").as("core_deg"))
  }

  /** BFS hop distance from `seed` over an UNDIRECTED canonical edge
    * list, up to `maxHops`: (node, hops) for every reached node — the
    * reachability/radius probe behind link-contamination tracing and
    * influence neighborhoods. Frontier-expansion form: round h joins
    * ONLY the hop-(h−1) frontier against the adjacency (co-partitioned
    * equi-join), merges by min, and checkpoint-truncates — each node
    * is expanded exactly once, so total work is O(edges) across all
    * rounds, never rounds × edges.
    *
    * Runs TO THE FIXPOINT (VERDICT r12 #2): the loop stops when the
    * frontier empties — no node gained a hop value last round, so no
    * node ever will — with `maxHops` as the hop-budget cap. The cap is
    * SEMANTIC when a caller passes one (e127's oracle is the textbook
    * recursive CTE bounded at `d < 8`, so the operator bounds
    * identically); the default is effectively unbounded, so the
    * default answer is full single-source reachability even on a
    * graph deeper than any fixed constant — the spec pins a chain
    * deeper than the old fixed-8 default. The frontier count is free
    * post-checkpoint, and a shallow graph stops after diameter+1
    * rounds instead of burning the full budget. */
  def hopDistance(edges: DataFrame, seed: Long,
                  maxHops: Int = Int.MaxValue): DataFrame = {
    val spark = edges.sparkSession
    val sym = CachePins.pinCheckpoint(
      edges.select(col("node_a").as("src"), col("node_b").as("dst"))
        .unionByName(
          edges.select(col("node_b").as("src"),
            col("node_a").as("dst"))))
    var dist = CachePins.pinCheckpoint(
      spark.range(1).select(lit(seed).as("node"),
        lit(0L).as("hops")))
    var h = 1
    var frontierSize = 1L
    while (frontierSize > 0L && h <= maxHops) {
      val frontier = dist.filter(col("hops") === (h - 1))
      val next = sym
        .join(frontier, sym("src") === frontier("node"))
        .select(col("dst").as("node"), lit(h.toLong).as("hops"))
      dist = CachePins.pinCheckpoint(
        dist.unionByName(next)
          .groupBy(col("node")).agg(min(col("hops")).as("hops")))
      frontierSize = dist.filter(col("hops") === h).count()
      h += 1
    }
    dist
  }

  /** Edge-WEIGHTED power-iteration PageRank over a DIRECTED weighted
    * edge list (src, dst, w): rank flows along edges in proportion to
    * weight — r' = (1−d)/n + d·Σ_in r·w/sw with sw the source's total
    * out-weight. The unweighted [[pageRank]] is the w≡1 special case;
    * on a similarity/co-purchase graph the weighted walk
    * discriminates strong ties from threshold-grazing ones. Same
    * topology and lineage rules as [[pageRank]] (the loop-invariant
    * (src, dst, w, sw) frame checkpoints once, per-round rank frames
    * truncate). Unlike [[pageRank]] (whose contract requires every
    * node to appear as a src), this variant handles a GENERAL directed
    * edge list: the node set is distinct(src ∪ dst), and each round
    * the mass held by dangling nodes (no out-edges) re-spreads
    * uniformly — the standard dangling-node treatment (Page et al.
    * 1999) — so Σ rank = 1 exactly, including on sink-bearing graphs
    * (spec-pinned). The per-round dangling mass is a single scalar
    * (an exact 0.0 on symmetrized inputs like e183's, so the
    * symmetric special case is bit-identical to the src-only walk);
    * collecting it is O(1), never O(nodes). */
  def weightedPageRank(edges: DataFrame, iters: Int = 5,
                       damping: Double = 0.85): DataFrame = {
    val sw = edges.groupBy(col("src")).agg(sum(col("w")).as("sw"))
    val topo = CachePins.pinCheckpoint(edges.join(sw, Seq("src")))
    val nodes = CachePins.pinCheckpoint(
      edges.select(col("src").as("node"))
        .unionByName(edges.select(col("dst").as("node")))
        .distinct())
    val n = nodes.count().toDouble
    val srcs = topo.select(col("src")).distinct()
    var ranks = nodes.withColumn("rank", lit(1.0) / lit(n))
    for (_ <- 1 to iters) {
      val contribs = topo
        .join(ranks, topo("src") === ranks("node"))
        .groupBy(col("dst"))
        .agg(sum(col("rank") * col("w") / col("sw")).as("c"))
      // exact dangling mass: Σ rank over nodes with no out-edge —
      // empty (0.0 exactly) on symmetrized graphs, so this branch
      // costs one scalar action and perturbs nothing when unused
      val dangling = ranks
        .join(srcs, ranks("node") === srcs("src"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0))).head.getDouble(0)
      ranks = CachePins.pinCheckpoint(
        nodes.join(contribs, nodes("node") === contribs("dst"), "left")
          .select(col("node"),
            (lit((1.0 - damping) / n + damping * dangling / n) +
              lit(damping) * coalesce(col("c"), lit(0.0))).as("rank")))
    }
    ranks.withColumn("n_nodes", lit(n))
  }

  /** Single-source MIN-COST paths (Bellman-Ford relaxation) over a
    * weighted UNDIRECTED edge list (node_a, node_b, w) with INTEGER
    * weights ≥ 1 — the weighted refinement of [[hopDistance]] (a
    * cheap 3-hop route can beat an expensive direct edge, which BFS
    * cannot see). Integer costs keep path sums exact cross-engine —
    * no float accumulation order to tie-break.
    *
    * Relaxes TO THE FIXPOINT: costs are monotone non-increasing and
    * the reached-set only grows, so the (count, total-cost) signature
    * is stationary iff no node improved — one aggregate per round on
    * the checkpointed frame decides termination, with `maxRounds` as
    * the safety/oracle-parity cap (rounds past the fixpoint are
    * no-ops, so an unrolled-CTE oracle with N ≥ the settling depth
    * matches exactly). Each round is one co-partitioned frontier
    * join + one min-merge aggregation — the [[pageRank]] topology. */
  def weightedShortestPath(edges: DataFrame, seed: Long,
                           maxRounds: Int = 64): DataFrame = {
    val spark = edges.sparkSession
    val sym = CachePins.pinCheckpoint(
      edges.select(col("node_a").as("src"), col("node_b").as("dst"),
          col("w"))
        .unionByName(edges.select(col("node_b").as("src"),
          col("node_a").as("dst"), col("w"))))
    var dist = CachePins.pinCheckpoint(
      spark.range(1).select(lit(seed).as("node"), lit(0L).as("cost")))
    def signature(d: DataFrame): (Long, Long) = {
      val r = d.agg(count(lit(1)), coalesce(sum(col("cost")), lit(0L)))
        .head()
      (r.getLong(0), r.getLong(1))
    }
    var sig = signature(dist)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val relaxed = sym
        .join(dist, sym("src") === dist("node"))
        .select(col("dst").as("node"), (col("cost") + col("w")).as("cost"))
      dist = CachePins.pinCheckpoint(
        dist.unionByName(relaxed)
          .groupBy(col("node")).agg(min(col("cost")).as("cost")))
      val s = signature(dist)
      converged = s == sig
      sig = s
      round += 1
    }
    dist
  }

  /** Personalized PageRank: the random walk RESTARTS at the seed set
    * instead of everywhere, so rank measures proximity TO the seeds —
    * the related-items / trust-propagation query (seeded at one
    * account, high-PPR nodes are its neighborhood weighted by all
    * walk paths, not just direct edges). Identical topology to
    * [[pageRank]] — one co-partitioned join + one aggregation shuffle
    * per round, per-round lineage truncation — with the teleport term
    * concentrated on the seeds (total mass stays 1 by construction).
    * Seeds are a bounded literal set (an `isin` predicate, no join). */
  def personalizedPageRank(edges: DataFrame, seeds: Seq[Long],
                           iters: Int = 5,
                           damping: Double = 0.85): DataFrame = {
    require(seeds.nonEmpty, "need at least one seed")
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val topo = CachePins.pinCheckpoint(edges.join(deg, Seq("src")))
    val nodes = CachePins.pinCheckpoint(
      edges.select(col("src").as("node")).distinct())
    val mass = 1.0 / seeds.size
    val restart = when(col("node").isInCollection(seeds), lit(mass))
      .otherwise(lit(0.0))
    var ranks = nodes.withColumn("rank", restart)
    for (_ <- 1 to iters) {
      val contribs = topo
        .join(ranks, topo("src") === ranks("node"))
        .groupBy(col("dst"))
        .agg(sum(col("rank") / col("outdeg")).as("c"))
      ranks = CachePins.pinCheckpoint(
        nodes.join(contribs, nodes("node") === contribs("dst"), "left")
          .select(col("node"),
            (lit(1.0 - damping) * restart +
              lit(damping) * coalesce(col("c"), lit(0.0)))
              .as("rank")))
    }
    ranks
  }

  /** HITS hubs and authorities over the DIRECTED bipartite
    * memberships (c → sp): authority(sp) = Σ hub(c) over its
    * customers, hub(c) = Σ authority(sp) over its suppliers,
    * L1-normalized each half-round — mutually reinforcing importance,
    * the query-dependent cousin of PageRank (a hub is good because it
    * touches good authorities and vice versa). Each half-round is ONE
    * co-partitioned join + one partial-aggregated groupBy; the
    * normalizer is a 1-row broadcast whose value ROUNDS before the
    * division (e36 — both engines then divide by the identical
    * scalar); per-round frames checkpoint-truncate. */
  def hits(pairs0: DataFrame, iters: Int = 3,
           maxDeg: Long = 1000L): DataFrame = {
    val deg = pairs0.groupBy(col("c")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") <= maxDeg).select(col("c"))
    val pairs = CachePins.pinCheckpoint(
      pairs0.join(deg, Seq("c"), "left_semi"))
    var hub = CachePins.pinCheckpoint(
      pairs.select(col("c")).distinct()
        .withColumn("hub", lit(1.0)))
    var auth: DataFrame = null
    for (_ <- 1 to iters) {
      val a0 = pairs.join(hub, Seq("c"))
        .groupBy(col("sp")).agg(sum(col("hub")).as("a"))
      val an = a0.agg(graft.Rounding.duckRound(sum(col("a")), 6)
        .as("s"))
      auth = CachePins.pinCheckpoint(
        a0.join(broadcast(an))
          .select(col("sp"), (col("a") / col("s")).as("auth")))
      val h0 = pairs.join(auth, Seq("sp"))
        .groupBy(col("c")).agg(sum(col("auth")).as("hh"))
      val hn = h0.agg(graft.Rounding.duckRound(sum(col("hh")), 6)
        .as("s"))
      hub = CachePins.pinCheckpoint(
        h0.join(broadcast(hn))
          .select(col("c"), (col("hh") / col("s")).as("hub")))
    }
    auth.select(lit("auth").as("side"), col("sp").as("node"),
        graft.Rounding.duckRound(col("auth"), 6).as("score"))
      .unionByName(hub.select(lit("hub").as("side"),
        col("c").as("node"),
        graft.Rounding.duckRound(col("hub"), 6).as("score")))
  }

  /** Item-item cosine recommendations from binary co-occurrence:
    * sim(a, b) = |A∩B| / √(|A|·|B|) over the capped memberships,
    * top-k per item by (similarity, key) — the "customers also
    * bought" serving table, the collaborative-filtering complement
    * of the content-based ANN stack. Counts are the [[
    * associationRules]] machinery (bounded by the same hot-key cap);
    * the ranking window runs over the pair table, whose size the
    * `minShared` support floor bounds. */
  def itemCosineTopK(pairs: DataFrame, minShared: Long,
                     k: Int = 3, maxDeg: Long = 1000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val deg = pairs.groupBy(col("c")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") <= maxDeg).select(col("c"))
    val capped = pairs.join(deg, Seq("c"), "left_semi")
    val co = capped.as("a").join(capped.as("b"),
        col("a.c") === col("b.c") && col("a.sp") =!= col("b.sp"))
      .groupBy(col("a.sp").as("node_a"), col("b.sp").as("node_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    val supp = capped.groupBy(col("sp")).agg(count(lit(1)).as("supp"))
    val sim = co
      .join(broadcast(supp.withColumnRenamed("sp", "node_a")
        .withColumnRenamed("supp", "supp_a")), Seq("node_a"))
      .join(broadcast(supp.withColumnRenamed("sp", "node_b")
        .withColumnRenamed("supp", "supp_b")), Seq("node_b"))
      .select(col("node_a"), col("node_b"), col("n_shared"),
        graft.Rounding.duckRound(
          col("n_shared").cast("double") /
            sqrt((col("supp_a") * col("supp_b")).cast("double")), 6)
          .as("cosine"))
    sim.withColumn("rnk", row_number().over(
        Window.partitionBy(col("node_a"))
          .orderBy(col("cosine").desc, col("node_b"))).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Association rules over the capped bipartite memberships: for
    * every canonical co-occurring item pair (a, b) with at least
    * `minShared` common baskets — the e107 candidate set — the
    * market-basket metrics: support count, both conditional
    * confidences P(b|a), P(a|b), and lift (>1 ⇒ the pair co-occurs
    * beyond independence). All counts are exact integers from
    * partial-aggregated groupBys (pair counts from the capped
    * self-join, item supports from one scan, the basket total from a
    * 1-row agg that broadcasts); the divisions are identical double
    * operands cross-engine. Same hot-key cap as
    * [[bipartiteProjection]] — the cap defines the semantics and the
    * oracle mirrors it. */
  def associationRules(pairs: DataFrame, minShared: Long,
                       maxDeg: Long = 1000L): DataFrame = {
    val deg = pairs.groupBy(col("c")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") <= maxDeg).select(col("c"))
    val capped = pairs.join(deg, Seq("c"), "left_semi")
    val co = capped.as("a").join(capped.as("b"),
        col("a.c") === col("b.c") && col("a.sp") < col("b.sp"))
      .groupBy(col("a.sp").as("node_a"), col("b.sp").as("node_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    val supp = capped.groupBy(col("sp")).agg(count(lit(1)).as("supp"))
    val baskets = capped.select(col("c")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    co
      .join(broadcast(supp.withColumnRenamed("sp", "node_a")
        .withColumnRenamed("supp", "supp_a")), Seq("node_a"))
      .join(broadcast(supp.withColumnRenamed("sp", "node_b")
        .withColumnRenamed("supp", "supp_b")), Seq("node_b"))
      .join(broadcast(baskets))
      .select(col("node_a"), col("node_b"), col("n_shared"),
        col("supp_a"), col("supp_b"),
        graft.Rounding.duckRound(
          col("n_shared").cast("double") / col("supp_a").cast("double"),
          6).as("conf_ab"),
        graft.Rounding.duckRound(
          col("n_shared").cast("double") / col("supp_b").cast("double"),
          6).as("conf_ba"),
        graft.Rounding.duckRound(
          (col("n_shared") * col("n_baskets")).cast("double") /
            (col("supp_a") * col("supp_b")).cast("double"), 6)
          .as("lift"))
  }
}
