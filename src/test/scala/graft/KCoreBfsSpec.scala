package graft

import graft.ext.GraphOps

/** Iterative k-core peeling and BFS hop distance over planted graphs
  * with known answers — including the chain that proves peeling is
  * iterative (a one-shot degree cut keeps the chain's middle nodes;
  * the true 2-core is empty) and the DEEP chains that prove the loops
  * run to the FIXPOINT, not a fixed round count (VERDICT r12 #2: a
  * fixed 6-round peel silently under-converges on a graph that needs
  * 10). */
class KCoreBfsSpec extends SparkSpec {
  import spark.implicits._

  private def g(edges: (Long, Long)*) =
    edges.toSeq.toDF("node_a", "node_b")

  private def chain(n: Int) =
    g((1 until n).map(i => (i.toLong, (i + 1).toLong)): _*)

  test("k-core keeps the triangle, drops the pendant") {
    // triangle 1-2-3 plus pendant 4 hanging off 1
    val got = GraphOps.kCore(g((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L)),
        k = 2)
      .collect().map(r => r.getAs[Long]("node") ->
        r.getAs[Long]("core_deg")).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("a chain unravels completely — the iterative property a " +
    "one-shot degree cut gets wrong") {
    // path 1-2-3-4: middles have degree 2, but peeling the endpoints
    // demotes them round by round; the 2-core is EMPTY
    val got = GraphOps.kCore(g((1L, 2L), (2L, 3L), (3L, 4L)), k = 2)
    assert(got.count() == 0L)
  }

  test("a capped peel past the fixpoint equals the fixpoint") {
    val e = g((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L))
    val a = GraphOps.kCore(e, k = 2, maxRounds = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = GraphOps.kCore(e, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("deep chain: a fixed 6-round peel under-converges, the " +
    "fixpoint loop does not") {
    // 22-node path: each peel removes only the two current endpoints,
    // so the empty 2-core needs 11 rounds. Capped at the old fixed 6,
    // 10 middle nodes survive WRONGLY; the fixpoint default empties it.
    val e = chain(22)
    assert(GraphOps.kCore(e, k = 2, maxRounds = 6).count() == 10L)
    assert(GraphOps.kCore(e, k = 2).count() == 0L)
  }

  test("BFS hop distance: min over paths, unreachable components " +
    "absent") {
    // 1-2-3-4 path, shortcut 1-4, and an island 8-9
    val got = GraphOps.hopDistance(
        g((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (8L, 9L)),
        seed = 1L)
      .collect().map(r => r.getAs[Long]("node") ->
        r.getAs[Long]("hops")).toMap
    // 4 is one hop via the shortcut, not three via the path
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("weighted shortest path: a cheap 3-hop detour beats the " +
    "expensive direct edge (what BFS cannot see), deep chains relax " +
    "to the fixpoint") {
    import graft.ext.GraphOps
    val e = Seq(
      (1L, 5L, 10L),            // direct but expensive
      (1L, 2L, 2L), (2L, 3L, 2L), (3L, 5L, 2L), // 3 hops, cost 6
      (5L, 6L, 1L))
      .toDF("node_a", "node_b", "w")
    val got = GraphOps.weightedShortestPath(e, seed = 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 2L, 3L -> 4L, 5L -> 6L, 6L -> 7L),
      s"got $got")
    // 30-node unit chain: cost == hops; needs 29 relaxation rounds —
    // far past any small fixed round count
    val chain = (1 until 30)
      .map(i => (i.toLong, (i + 1).toLong, 1L)).toDF("node_a", "node_b", "w")
    val far = GraphOps.weightedShortestPath(chain, seed = 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(far(30L) == 29L && far.size == 30)
  }

  test("the hop budget truncates the frontier") {
    val got = GraphOps.hopDistance(
        g((1L, 2L), (2L, 3L), (3L, 4L)), seed = 1L, maxHops = 2)
      .collect().map(r => r.getAs[Long]("node") ->
        r.getAs[Long]("hops")).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("deep chain: the default reaches past any fixed hop budget " +
    "and stops at the empty frontier") {
    // 15-node path: eccentricity 14 from node 1 — deeper than the old
    // fixed-8 default. The fixpoint default reaches everything (and
    // stops at round 15, not after Int.MaxValue rounds — this test
    // finishing IS the early-exit proof); a budget of 8 reaches 9.
    val e = chain(15)
    val full = GraphOps.hopDistance(e, seed = 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full == (1 to 15).map(i => i.toLong -> (i - 1).toLong).toMap)
    assert(GraphOps.hopDistance(e, seed = 1L, maxHops = 8)
      .count() == 9L)
  }
}
