package graft

import graft.ext.GraphOps

/** Iterative k-core peeling and BFS hop distance over planted graphs
  * with known answers — including the chain that proves peeling is
  * iterative (a one-shot degree cut keeps the chain's middle nodes;
  * the true 2-core is empty). */
class KCoreBfsSpec extends SparkSpec {
  import spark.implicits._

  private def g(edges: (Long, Long)*) =
    edges.toSeq.toDF("node_a", "node_b")

  test("k-core keeps the triangle, drops the pendant") {
    // triangle 1-2-3 plus pendant 4 hanging off 1
    val got = GraphOps.kCore(g((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L)),
        k = 2, rounds = 4)
      .collect().map(r => r.getAs[Long]("node") ->
        r.getAs[Long]("core_deg")).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("a chain unravels completely — the iterative property a " +
    "one-shot degree cut gets wrong") {
    // path 1-2-3-4: middles have degree 2, but peeling the endpoints
    // demotes them round by round; the 2-core is EMPTY
    val got = GraphOps.kCore(g((1L, 2L), (2L, 3L), (3L, 4L)),
      k = 2, rounds = 4)
    assert(got.count() == 0L)
  }

  test("rounds past the fixpoint are no-ops") {
    val e = g((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L))
    val a = GraphOps.kCore(e, k = 2, rounds = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = GraphOps.kCore(e, k = 2, rounds = 7).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("BFS hop distance: min over paths, hop cap, unreachable " +
    "components absent") {
    // 1-2-3-4 path, shortcut 1-4, and an island 8-9
    val got = GraphOps.hopDistance(
        g((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (8L, 9L)),
        seed = 1L, maxHops = 8)
      .collect().map(r => r.getAs[Long]("node") ->
        r.getAs[Long]("hops")).toMap
    // 4 is one hop via the shortcut, not three via the path
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("the hop budget truncates the frontier") {
    val got = GraphOps.hopDistance(
        g((1L, 2L), (2L, 3L), (3L, 4L)), seed = 1L, maxHops = 2)
      .collect().map(r => r.getAs[Long]("node") ->
        r.getAs[Long]("hops")).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }
}
