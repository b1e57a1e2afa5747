package graft

import org.apache.spark.sql.functions.col

import graft.ext.{EventAnalytics, GraphOps}

/** Personalized PageRank, HITS, item-item CF, and activity coverage
  * over planted fixtures with known orderings. */
class GraphRankSpec extends SparkSpec {
  import spark.implicits._

  test("E201: label propagation converges to per-clique min-id " +
    "communities on two bridged triangles; the bare-edge 2-cycle " +
    "confirms the round cap is semantic") {
    // triangles {1,2,3} and {10,11,12} bridged by 3–10
    def und(ps: (Long, Long)*) =
      (ps ++ ps.map(p => (p._2, p._1))).toDF("src", "dst")
    val g = und((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L),
      (11L, 12L), (10L, 12L), (3L, 10L))
    val got = GraphOps.labelPropagation(g, 6).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // hand trace: by round 3 triangle A settles on label 1 and the
    // bridge has seeded node 3's id into triangle B, which settles on
    // label 3 (rounds 4..6 are stable) — two communities of size 3
    assert(Seq(1L, 2L, 3L).forall(n => got(n) == (1L, 3L)), got.toString)
    assert(Seq(10L, 11L, 12L).forall(n => got(n) == (3L, 3L)),
      got.toString)
    // a single undirected edge 2-cycles under synchronous updates:
    // odd rounds swap the labels, even rounds restore them
    val pair = und((5L, 6L))
    val odd = GraphOps.labelPropagation(pair, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(odd == Map(5L -> 6L, 6L -> 5L))
    val even = GraphOps.labelPropagation(pair, 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(even == Map(5L -> 5L, 6L -> 6L))
  }

  test("E154: PPR mass stays 1; the seeded star center dominates " +
    "its symmetric leaves") {
    // star: center 1 — leaves 2, 3, 4 (a path fixture would
    // oscillate: bipartite structure + 5 unconverged power rounds
    // make rank non-monotone in distance — a real property of the
    // algorithm, not a bug, so the fixture avoids it)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L))
      .toDF("node_a", "node_b")
    val sym = edges.select(col("node_a").as("src"),
        col("node_b").as("dst"))
      .unionByName(edges.select(col("node_b").as("src"),
        col("node_a").as("dst")))
    val r = GraphOps.personalizedPageRank(sym, Seq(1L))
      .collect().map(x => x.getAs[Long]("node") ->
        x.getAs[Double]("rank")).toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-9,
      s"teleport + spread must conserve mass, got ${r.values.sum}")
    assert(r(1L) > r(2L), s"seed center must dominate: $r")
    assert(r(2L) == r(3L) && r(3L) == r(4L),
      s"symmetric leaves must tie exactly: $r")
  }

  test("E155: shared authorities and busier hubs score higher; " +
    "each side L1-normalizes") {
    // c1 buys {10}; c2 buys {10, 11}: supplier 10 has two customers
    val pairs = Seq((1L, 10L), (2L, 10L), (2L, 11L)).toDF("c", "sp")
    val rows = GraphOps.hits(pairs).collect()
      .map(r => (r.getAs[String]("side"), r.getAs[Long]("node")) ->
        r.getAs[Double]("score")).toMap
    assert(rows(("auth", 10L)) > rows(("auth", 11L)))
    assert(rows(("hub", 2L)) > rows(("hub", 1L)))
    val authSum = rows.filter(_._1._1 == "auth").values.sum
    val hubSum = rows.filter(_._1._1 == "hub").values.sum
    assert(math.abs(authSum - 1.0) < 1e-5)
    assert(math.abs(hubSum - 1.0) < 1e-5)
  }

  test("E156: binary cosine from co-occurrence; both directions " +
    "ranked") {
    // baskets: {A,B}, {A,B}, {A} — cos(A,B) = 2/√(3·2)
    val pairs = Seq((1L, 100L), (1L, 200L), (2L, 100L), (2L, 200L),
      (3L, 100L)).toDF("c", "sp")
    val got = GraphOps.itemCosineTopK(pairs, minShared = 2L)
      .collect().map(r => (r.getAs[Long]("node_a"),
        r.getAs[Long]("node_b")) ->
        (r.getAs[Double]("cosine"), r.getAs[Long]("rnk"))).toMap
    val want = Rounding.duckRoundDouble(2.0 / math.sqrt(6.0), 6)
    assert(got((100L, 200L)) == (want, 1L))
    assert(got((200L, 100L)) == (want, 1L))
  }

  test("E158: survivorship picks min-id keep, longest text, and " +
    "majority (tie: alphabetical) language; singletons are their " +
    "own golden record") {
    val docs = Seq((1L, 5L, "fr"), (2L, 9L, "en"), (3L, 4L, "de"))
      .toDF("doc_id", "n_chars", "lang")
    val comp = Seq((1L, 1L), (2L, 1L)).toDF("id", "label")
    val got = graft.ext.Clustering.survivorship(docs, comp)
      .collect().map(r => r.getAs[Long]("cluster_id") ->
        (r.getAs[Long]("n_members"), r.getAs[Long]("keep_id"),
          r.getAs[Long]("rep_doc_id"), r.getAs[Long]("rep_n_chars"),
          r.getAs[String]("majority_lang"))).toMap
    // lang tie (en 1, fr 1) breaks alphabetically → en
    assert(got(1L) == (2L, 1L, 2L, 9L, "en"))
    assert(got(3L) == (1L, 3L, 3L, 4L, "de"))
  }

  test("E161: a 100%-vs-0% split at n=3+3 is significant; the z " +
    "follows the rounded chain") {
    val ev = (Seq(0L, 2L, 4L).flatMap(u => Seq(
      (u, ts("2024-01-01 10:00:00"), "purchase"),
      (u, ts("2024-01-01 11:00:00"), "view"))) ++
      Seq(1L, 3L, 5L).map(u => (u, ts("2024-01-01 10:00:00"), "view")))
      .toDF("user_id", "ts", "event_type")
    val r = EventAnalytics.abZTest(ev, minPurchases = 1L).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("conv_a") == 3L &&
      r(0).getAs[Long]("conv_b") == 0L)
    // z = (1 − 0)/√(0.5·0.5·(1/3 + 1/3)) = √6 ≈ 2.449 > 1.96
    val z = Rounding.duckRoundDouble(
      1.0 / math.sqrt(0.5 * 0.5 * (1.0 / 3 + 1.0 / 3)), 6)
    assert(r(0).getAs[Double]("z") == z)
    assert(r(0).getAs[Boolean]("significant"))
  }

  test("E157: coverage = active/span; the longest gap counts missing " +
    "days") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-02 09:00:00")),
      (1L, ts("2024-01-02 23:00:00")), // same day twice
      (1L, ts("2024-01-04 10:00:00")), // skips Jan 3
      (2L, ts("2024-01-05 10:00:00"))) // single day
      .toDF("user_id", "ts")
    val got = EventAnalytics.activityCoverage(ev).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("active_days"), r.getAs[Long]("span_days"),
          r.getAs[Double]("coverage"),
          r.getAs[Long]("longest_gap_days"))).toMap
    assert(got(1L) == (3L, 4L, 0.75, 1L))
    assert(got(2L) == (1L, 1L, 1.0, 0L))
  }
}
