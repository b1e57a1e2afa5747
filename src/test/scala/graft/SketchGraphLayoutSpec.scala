package graft

import org.apache.spark.sql.functions._

import graft.ext.{GraphOps, Layout, Sketches}

/** The sketch/graph/layout operators behind e87/e88/e91/e92: the
  * probabilistic CONTRACTS (no false negatives, never undercount) that
  * make the exact-verify pattern exact, PageRank's fixed points, and the
  * Z-order pruning win the layout exists for. The cross-engine value
  * parity of the full queries is the oracle gate's job; these pin the
  * algebraic guarantees a data regeneration must not break. */
class SketchGraphLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("bloom: zero false negatives on members, false positives visible " +
    "but bounded") {
    val members = (0 until 200).map(i => s"member-$i").toDF("k")
    val words = Sketches.bloomBuild(members, col("k")).toSeq
    // every inserted key probes true — the contract that lets
    // non-candidates skip the exact verify entirely
    val fn = members
      .filter(!Sketches.bloomMightContain(words, col("k"))).count()
    assert(fn == 0)
    // non-members: FPR well under 50% at n=200, m=4096, k=3
    // (theoretical ~0.4% — 2000 probes keeps the bound loose but real)
    val others = (0 until 2000).map(i => s"other-$i").toDF("k")
    val fp = others
      .filter(Sketches.bloomMightContain(words, col("k"))).count()
    assert(fp < 200, s"FPR implausibly high: $fp / 2000")
  }

  test("cms: estimates never undercount, exact for isolated keys") {
    val rows = (Seq.fill(50)("heavy") ++ (0 until 100).map(i => s"k$i"))
      .toDF("k")
    val counters = Sketches.cmsBuild(rows, col("k")).toSeq
    val est = rows.groupBy(col("k")).agg(count(lit(1)).as("n"))
      .withColumn("est", Sketches.cmsEstimate(counters, col("k")))
    // CMS can only ADD collision mass — est < exact would break the
    // heavy-hitter candidate-superset guarantee
    assert(est.filter(col("est") < col("n")).count() == 0)
    // the heavy key's estimate includes its own 50
    val h = est.filter(col("k") === "heavy").select(col("est"))
      .as[Long].head()
    assert(h >= 50)
  }

  test("histogram sketch: per-shard cells merge into the whole-corpus " +
    "histogram exactly (the mergeability contract)") {
    val vals = (0 until 1000).map(i => (i.toLong, (i % 500) * 1.01))
      .toDF("id", "value")
    val whole = Sketches.histCells(vals, col("value")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val merged = Sketches.histCells(vals.filter(col("id") % 2 === 0),
        col("value"))
      .unionByName(Sketches.histCells(vals.filter(col("id") % 2 =!= 0),
        col("value")))
      .groupBy(col("bin")).agg(sum(col("c")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged == whole)
  }

  test("histogram sketch: quantile estimates land within one bin of " +
    "exact on a uniform distribution, exact at bin edges") {
    // 512 values 0.5, 1.5, ..., 511.5 — exactly 16 per bin
    val vals = (0 until 512).map(i => (i.toLong, i + 0.5))
      .toDF("id", "value")
    val got = Sketches.histQuantileScorecard(
        Sketches.histCells(vals, col("value")), vals, "value",
        Seq(0.25, 0.5, 0.75))
      .collect().map(r => r.getDouble(0) ->
        (r.getDouble(1), r.getDouble(2), r.getBoolean(4))).toMap
    // p=0.5: target 256 = exactly the end of bin 15 → est = 256.0;
    // exact interpolated quantile of the ladder = 255.5 + 0.5 = ...
    assert(got(0.5)._1 == 256.0)
    assert(got.values.forall(_._3), s"within_bin violated: $got")
    got.foreach { case (p, (est, exact, _)) =>
      assert(math.abs(est - exact) <= 16.0, s"p=$p est=$est exact=$exact")
    }
  }

  test("hll: shard registers max-merge into the whole-corpus " +
    "registers exactly, and the estimate tracks truth") {
    val keys = (0 until 2000).map(i => s"key-$i").toDF("k")
    val whole = Sketches.hllRegisters(keys, col("k")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val merged = Sketches.hllRegisters(
        keys.filter(length(col("k")) % 2 === 0), col("k"))
      .unionByName(Sketches.hllRegisters(
        keys.filter(length(col("k")) % 2 =!= 0), col("k")))
      .groupBy(col("j")).agg(max(col("m_rho")).as("m_rho"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(merged == whole)
    // 64 registers → rsd ≈ 1.04/√64 = 13%; duplicate keys change nothing
    val est = Sketches.hllScorecard(
        Sketches.hllRegisters(keys.unionByName(keys), col("k")),
        keys.agg(countDistinct(col("k")).as("n_exact")), "k")
      .collect()(0)
    assert(est.getLong(1) == 2000L)
    assert(est.getDouble(5) < 0.4, s"rel_err=${est.getDouble(5)}")
  }

  test("hll sliding windows: each window's registers equal the " +
    "from-scratch sketch of its covered panes' union (E196)") {
    // panes on days 10, 11, 13 (12 missing), disjoint-ish key sets
    val keyed = ((0 until 300).map(i => (10L, s"a-$i")) ++
      (200 until 500).map(i => (11L, s"a-$i")) ++
      (0 until 100).map(i => (13L, s"b-$i"))).toDF("d", "k")
    val panes = Sketches.hllRegistersBy(keyed, col("d"), col("k"))
    val slid = Sketches.hllSlidingRegisters(panes, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2))
      .toMap
    // windows are labeled by existing last days only: 10, 11, 13
    assert(slid.keys.map(_._1).toSet == Set(10L, 11L, 13L))
    // window 13 covers panes 11..13 (12 absent, 10 excluded);
    // window 11 covers 10..11; window 10 covers only itself
    def fresh(days: Long*) = Sketches.hllRegisters(
        keyed.filter(col("d").isin(days: _*)), col("k"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    for (j <- 0L until 64L) {
      assert(slid((10L, j)) == fresh(10L)(j), s"w=10 j=$j")
      assert(slid((11L, j)) == fresh(10L, 11L)(j), s"w=11 j=$j")
      assert(slid((13L, j)) == fresh(11L, 13L)(j), s"w=13 j=$j")
    }
  }

  test("cms join cardinality: never undercounts, exact when buckets " +
    "don't collide") {
    val a = (0 until 50).flatMap(u => Seq.fill(u % 5 + 1)(u.toLong))
      .toDF("k")
    val b = (0 until 50).map(_.toLong).toDF("k")
    val est = Sketches.cmsJoinCardinality(
        Sketches.cmsCells(a, col("k").cast("string")),
        Sketches.cmsCells(b, col("k").cast("string")))
      .collect()(0).getLong(0)
    val exact = (0 until 50).map(u => (u % 5 + 1).toLong).sum
    assert(est >= exact, s"est=$est exact=$exact")
    // 50 keys into 256 buckets: collisions possible but bounded —
    // the estimate stays within a small multiple of truth
    assert(est <= exact * 3, s"est=$est exact=$exact")
  }

  test("weightedPageRank: w=1 reduces exactly to the unweighted " +
    "walk; a heavier edge pulls rank") {
    val sym = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (2L, 3L),
      (3L, 2L)).toDF("src", "dst")
    val unw = GraphOps.pageRank(sym, iters = 4).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val w1 = GraphOps.weightedPageRank(sym.withColumn("w", lit(1L)),
        iters = 4).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(unw.keySet == w1.keySet)
    unw.foreach { case (k, v) => assert(math.abs(v - w1(k)) < 1e-12) }
    // star: hub 1 sends rank to 2 and 3; tripling 3's in-weight
    // must rank 3 above 2 (the unweighted walk ties them)
    val wsym = Seq((1L, 2L, 1L), (2L, 1L, 1L), (1L, 3L, 3L),
      (3L, 1L, 3L)).toDF("src", "dst", "w")
    val ranks = GraphOps.weightedPageRank(wsym, iters = 4).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ranks(3L) > ranks(2L))
  }

  test("weightedPageRank: dst-only sink joins the node set and mass " +
    "is conserved on a general directed graph") {
    // 3 is a pure sink (appears only as dst): it must surface in the
    // output, and its absorbed mass must re-spread — Σ rank stays 1
    // exactly (the VERDICT r14 defect: sinks were dropped and their
    // incoming mass left the system)
    val e = Seq((1L, 2L, 1L), (1L, 3L, 2L), (2L, 3L, 1L))
      .toDF("src", "dst", "w")
    val pr = GraphOps.weightedPageRank(e, iters = 6).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr.keySet == Set(1L, 2L, 3L))
    assert(math.abs(pr.values.sum - 1.0) < 1e-12)
    // 3 receives from 1 (2/3 of its rank) and all of 2's — it must
    // out-rank 2, which receives only 1/3 of 1's
    assert(pr(3L) > pr(2L))
  }

  test("pageRank: uniform on a symmetric cycle, mass conserved") {
    // every node of a 6-cycle is equivalent → rank = 1/6 exactly at
    // every iteration (the fixed point of the symmetric walk)
    val fwd = (0L until 6L).map(i => (i, (i + 1) % 6))
    val edges = (fwd ++ fwd.map(_.swap)).toDF("src", "dst")
    val pr = GraphOps.pageRank(edges, iters = 5).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    pr.values.foreach(v => assert(math.abs(v - 1.0 / 6) < 1e-12))
    assert(math.abs(pr.values.sum - 1.0) < 1e-12)
  }

  test("pageRank: hub out-ranks leaves on a star") {
    // star 0-{1,2,3,4}, undirected: the hub receives from 4 leaves,
    // each leaf only from the hub
    val fwd = (1L to 4L).map(i => (0L, i))
    val edges = (fwd ++ fwd.map(_.swap)).toDF("src", "dst")
    val pr = GraphOps.pageRank(edges, iters = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr(0L) > pr(1L) * 2)
    assert(math.abs(pr.values.sum - 1.0) < 1e-12)
  }

  test("bipartiteProjection: shared-neighbor weights and the hot-key " +
    "cap") {
    import graft.ext.GraphOps
    // left key 1 links {10,11,12}; left key 2 links {10,11}; hot key 9
    // links everything and must be dropped by maxDeg = 3
    val pairs = (Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L),
      (2L, 11L)) ++ (10L to 13L).map(sp => (9L, sp)))
      .toDF("c", "sp")
    val got = GraphOps.bipartiteProjection(pairs, minShared = 1L,
        maxDeg = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == Map((10L, 11L) -> 2L, (10L, 12L) -> 1L,
      (11L, 12L) -> 1L), s"got $got")
  }

  test("triangleParticipation: counts corners of each triangle once") {
    import graft.ext.GraphOps
    // triangle 1-2-3 plus pendant edge 3-4: nodes 1,2,3 get one
    // triangle each, node 4 none
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
      .toDF("node_a", "node_b")
    val got = GraphOps.triangleParticipation(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L), s"got $got")
  }

  test("interleaveBits: Morton order groups quadrants") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (255L, 255L))
      .toDF("x", "y")
      .withColumn("z", Layout.interleaveBits(col("x"), col("y")))
    val z = df.select(col("z")).as[Long].collect()
    assert(z(0) == 0L)      // (0,0) → 0
    assert(z(1) == 1L)      // x bit 0 → even position
    assert(z(2) == 2L)      // y bit 0 → odd position
    assert(z(3) == 65535L)  // all 16 bits set
  }

  test("zorder file map prunes x-range scans that a time layout cannot") {
    val sfDir = "/root/testdata/sf0.001"
    val ev = Tables.load(spark, sfDir, "events")
    val base = ev.select(col("event_id"), col("ts"),
        pmod(col("user_id"), lit(256L)).as("x"),
        least(lit(255L), floor(col("value") / 2)).as("y"))
      .withColumn("zkey", Layout.interleaveBits(col("x"), col("y")))
    val stats = Layout.fileStats(base, "zorder",
        Seq(col("zkey"), col("event_id")), 100)
      .unionByName(Layout.fileStats(base, "time",
        Seq(col("ts"), col("event_id")), 100))
    val score = Layout.pruningScore(stats, "x", 10, 40).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (zn, zs) = score("zorder")
    val (tn, tscan) = score("time")
    assert(zn == tn)
    // time order is uncorrelated with user bucket → every file spans
    // the whole x range; the Morton key keeps envelopes tight
    assert(tscan == tn, "time layout should have no x pruning at all")
    assert(zs < tn, s"zorder should prune some files: scans $zs of $zn")
  }

  test("sortedNeighborhood: near-dups sort adjacent and ranks are " +
    "partition-invariant") {
    import graft.ext.Dedup
    // 30 docs: ids 100+i and 200+i share a normalized prefix-heavy
    // text (one-word mutation) → they sort adjacent and the window
    // catches every planted pair
    val docs = (0 until 15).flatMap { i =>
      val base = s"prefix$i alpha beta gamma delta epsilon zeta eta"
      Seq((100L + i, base), (200L + i, s"$base extra"))
    }.toDF("doc_id", "text")
    def pairs(parts: Int): Set[(Long, Long)] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val p = Dedup.sortedNeighborhoodPairs(docs, window = 1)
        .filter(col("jaccard") > 0.3)
        .select(col("doc_a"), col("doc_b")).as[(Long, Long)]
        .collect().toSet
      spark.conf.set("spark.sql.shuffle.partitions", 4)
      spark.sharedState.cacheManager.clearCache()
      p
    }
    val got = pairs(4)
    assert((0 until 15).forall(i => got.contains((100L + i, 200L + i))),
      s"every planted adjacent pair must surface, got $got")
    // the rank construction is a pure function of the total order —
    // a different partition count must yield identical pairs
    assert(pairs(2) == got && pairs(7) == got,
      "rank offsets must be partition-invariant")
  }

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    import graft.ext.Cdc
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val neu = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("doc_id", "text")
    val got = Cdc.snapshotDiff(old, neu).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("zorderWrite: real parquet files carry tight x envelopes") {
    val sfDir = "/root/testdata/sf0.001"
    val out = java.nio.file.Files
      .createTempDirectory("zorder_write").toString
    val ev = Tables.load(spark, sfDir, "events")
    val base = ev.select(col("event_id"),
      pmod(col("user_id"), lit(256L)).as("x"),
      least(lit(255L), floor(col("value") / 2)).as("y"))
    Layout.zorderWrite(base,
      Layout.interleaveBits(col("x"), col("y")), numFiles = 8, out)
    // per-physical-file envelopes from the written layout
    val env = spark.read.parquet(out)
      .withColumn("f", input_file_name())
      .groupBy(col("f"))
      .agg((max(col("x")) - min(col("x"))).as("xw"))
    val mean = env.agg(avg(col("xw"))).head().getDouble(0)
    // 8 range-partitioned z files over a 0..255 x domain: mean envelope
    // must be well under the full span (time/file-order gives ~255)
    assert(mean < 200, s"mean x envelope too wide: $mean")
  }
}
